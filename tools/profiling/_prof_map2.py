import time
import numpy as np
from collections import defaultdict
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
import orbslam2_tpu.local_mapping as LM
import orbslam2_tpu.loop_closing as LC
import orbslam2_tpu.map.state as MS
import orbslam2_tpu.map.keyframe_database as KDB

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
        stats[cls.__name__ + "." + name].append(time.perf_counter() - t0)
        return r
    setattr(cls, name, f)

for n in ("update_point_attributes", "update_connections", "add_keyframe",
          "add_map_points_batch", "add_observations_batch", "recycle_free_slots"):
    wrap(MS.MapState, n)
if hasattr(MS, "DeviceKFMirror"):
    wrap(MS.DeviceKFMirror, "ensure")
for n in ("_local_ba_gather", "_local_ba_solve", "_local_ba_write_back",
          "_fuse_neighbors", "_create_new_points",
          "_create_new_points_gather", "_create_new_points_commit",
          "_fuse_commit", "_refresh_tracked_points"):
    wrap(LM.LocalMapper, n)

import jax
import orbslam2_tpu.tracking as T
for n in ("_create_keyframe_locked", "_spawn_depth_points"):
    wrap(T.Tracker, n)

def wrap_kernel(mod, name):
    orig = getattr(mod, name)
    def f(*a, **kw):
        t0 = time.perf_counter()
        r = jax.block_until_ready(orig(*a, **kw))
        stats["KERNEL." + name].append(time.perf_counter() - t0)
        return r
    setattr(mod, name, f)
wrap_kernel(LM, "_triangulate_neighbors_mirror")
wrap_kernel(LM, "_fuse_match_mirror")
for n in ("process_keyframe",):
    wrap(LC.LoopCloser, n)
for n in ("add", "compute_bow"):
    if hasattr(KDB.KeyFrameDatabase, n):
        wrap(KDB.KeyFrameDatabase, n)

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
for k, v in sorted(stats.items(), key=lambda kv: -sum(kv[1])):
    if not v: continue
    a = np.array(v) * 1000
    print(f"{k:40s} n={len(v):3d} total={a.sum():8.1f}ms mean={a.mean():7.1f} med={np.median(a):7.1f} max={a.max():7.1f}")
slam.shutdown()
