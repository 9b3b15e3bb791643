import faulthandler, time, numpy as np
faulthandler.dump_traceback_later(120, repeat=True)
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
H, W = 480, 640
K = np.array([[520.0, 0, W/2], [0, 520.0, H/2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, _ = render_sequence(40, K, width=W, height=H, with_depth=True)
slam = SlamSystem(cfg)
t0 = time.perf_counter()
for i in range(40):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i/30.0)
    if i % 10 == 0:
        print(f"frame {i}  t={time.perf_counter()-t0:.1f}s", flush=True)
print(f"done {time.perf_counter()-t0:.1f}s; kf={len(slam.map.valid_keyframes())}")
