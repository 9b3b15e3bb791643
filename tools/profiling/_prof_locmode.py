"""Tracking-only steady state: build a map for 60 frames, then switch to
localization mode (mapper idle) and measure fps — isolates mapper
interference from the tracker's own pipeline cost."""
import time
import numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, poses = render_sequence(150, K, width=W, height=H, with_depth=True)
slam = AsyncSlamSystem(cfg)
slam.warmup()
for i in range(60):
    img, dep = frames[i]
    slam.track_rgbd(img, dep, i / 30.0)
import time as _t
_t.sleep(1.0)  # drain mapper queue
slam.activate_localization_mode()
N = 80
t0 = time.perf_counter()
for i in range(60, 60 + N):
    img, dep = frames[i]
    slam.track_rgbd(img, dep, i / 30.0)
    if i % 10 == 0:
        print(f"frame {i} state={slam.tracker.state}", flush=True)
dt = time.perf_counter() - t0
print(f"localization-only fps={N/dt:.2f}  ms/frame={dt/N*1000:.1f}")
slam.shutdown()
