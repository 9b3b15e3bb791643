import sys, time
import numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
cfg.runtime.pipeline_depth = depth
frames, poses = render_sequence(150, K, width=W, height=H, with_depth=True)
slam = AsyncSlamSystem(cfg)
slam.warmup()
for i in range(30):
    img, dep = frames[i % len(frames)]
    slam.track_rgbd(img, dep, i / 30.0)
N = 120
t0 = time.perf_counter()
for i in range(30, 30 + N):
    img, dep = frames[i]
    slam.track_rgbd(img, dep, i / 30.0)
dt = time.perf_counter() - t0
# accuracy proxy: compare trajectory to ground truth
slam.tracker.flush_pipeline()
print(f"depth={depth}  fps={N/dt:.2f}  ms/frame={dt/N*1000:.1f}  kfs={int(slam.map.kf_valid.sum())}  pts={int(slam.map.mp_valid.sum())}")
slam.shutdown()
