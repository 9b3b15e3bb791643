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
def wrap(cls, name):
    orig = getattr(cls, name)
    def f(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        stats[name].append(time.perf_counter() - t0)
        return r
    setattr(cls, name, f)

for n in ("_make_frame", "_gather_local_points", "_unpack_fused", "_dispatch_track",
          "_dispatch_track_chained", "_commit_pending_one", "_need_new_keyframe",
          "_create_keyframe", "_finish_track"):
    wrap(T.Tracker, n)

import orbslam2_tpu.local_mapping as LM
for n in ("_refresh_tracked_points", "_cull_map_points", "_create_new_points",
          "_fuse_neighbors", "local_bundle_adjustment", "_cull_keyframes"):
    wrap(LM.LocalMapper, n)

slam = AsyncSlamSystem(cfg)
slam.warmup()
for i in range(30):
    img, depth = frames[i % len(frames)]
    slam.track_rgbd(img, depth, i / 30.0)
for k in stats: stats[k].clear()
t0 = time.perf_counter()
N = 120
for i in range(30, 30 + N):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i / 30.0)
dt = time.perf_counter() - t0
print(f"fps={N/dt:.2f}  ms/frame={dt/N*1000:.1f}")
for k, v in sorted(stats.items(), key=lambda kv: -sum(kv[1])):
    a = np.array(v) * 1000
    print(f"{k:24s} n={len(v):3d} total={a.sum():8.1f}ms mean={a.mean():7.1f} med={np.median(a):7.1f} max={a.max():7.1f}")
slam.shutdown()
