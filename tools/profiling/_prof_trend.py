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
ts = []
for i, (img, depth) in enumerate(frames):
    t0 = time.perf_counter()
    slam.track_rgbd(img, depth, i / 30.0)
    ts.append(time.perf_counter() - t0)
a = np.array(ts) * 1000
for lo in range(0, 150, 30):
    seg = a[lo:lo+30]
    print(f"frames {lo:3d}-{lo+29}: mean={seg.mean():7.1f}ms med={np.median(seg):7.1f} max={seg.max():8.1f}  fps={1000/seg.mean():5.2f}")
print("KFs:", len(slam.map.valid_keyframes()), "points:", int(slam.map.mp_valid.sum()))
slam.shutdown()
