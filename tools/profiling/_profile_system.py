import time, cProfile, pstats, io
import numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, poses = render_sequence(45, K, width=W, height=H, with_depth=True)
slam = AsyncSlamSystem(cfg)
for i in range(15):
    img, depth = frames[i % len(frames)]
    slam.track_rgbd(img, depth, i / 30.0)

pr = cProfile.Profile()
pr.enable()
t0 = time.perf_counter()
for i in range(15, 45):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i / 30.0)
dt = time.perf_counter() - t0
pr.disable()
slam.shutdown()
print(f"fps={30/dt:.2f}  ms/frame={dt/30*1000:.1f}")
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue())
