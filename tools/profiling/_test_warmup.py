import time, numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=320, cy=240, width=640, height=480, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
slam = AsyncSlamSystem(cfg)
print("warmup took", round(slam.warmup(verbose=True), 1), "s")
slam.shutdown()
