import time
import numpy as np
from collections import defaultdict
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
import orbslam2_tpu.tracking as T

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, poses = render_sequence(150, K, width=W, height=H, with_depth=True)

stats = defaultdict(list)
orig_unpack = T.Tracker._unpack_fused
burst_pos = [0]
def unpack(self, packed):
    t0 = time.perf_counter()
    p = np.asarray(packed)
    dt = (time.perf_counter() - t0) * 1e3
    stats[f"pull_{burst_pos[0]}"].append(dt)
    burst_pos[0] += 1
    return orig_unpack(self, p)
T.Tracker._unpack_fused = unpack

orig_track = T.Tracker.track_pipelined
def track(self, *a, **kw):
    burst_pos[0] = 0
    t0 = time.perf_counter()
    r = orig_track(self, *a, **kw)
    stats["frame_total"].append((time.perf_counter() - t0) * 1e3)
    return r
T.Tracker.track_pipelined = track

slam = AsyncSlamSystem(cfg)
slam.warmup()
for i in range(30):
    img, depth = frames[i % len(frames)]
    slam.track_rgbd(img, depth, i / 30.0)
for k in stats: stats[k].clear()
N = 120
t0 = time.perf_counter()
for i in range(30, 30 + N):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i / 30.0)
dt = time.perf_counter() - t0
print(f"fps={N/dt:.2f}  ms/frame={dt/N*1000:.1f}")
for k, v in sorted(stats.items()):
    a = np.array(v)
    print(f"{k:12s} n={len(v):3d} mean={a.mean():7.2f} med={np.median(a):7.2f} p90={np.percentile(a,90):7.2f} max={a.max():8.2f}")
slam.shutdown()
