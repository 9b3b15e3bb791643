"""Why does _unpack_fused still cost ~14 ms with a depth-2 pipeline?

Instruments: time from dispatch->commit per frame, whether the packed copy
is ready at commit (via a zero-cost probe: np.asarray timing), and
_make_frame subparts.
"""
import time
import numpy as np
from collections import defaultdict
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
import orbslam2_tpu.tracking as T
import jax.numpy as jnp

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, poses = render_sequence(150, K, width=W, height=H, with_depth=True)

stats = defaultdict(list)

orig_unpack = T.Tracker._unpack_fused
def unpack(self, packed):
    t0 = time.perf_counter()
    p = np.asarray(packed)
    t1 = time.perf_counter()
    r = orig_unpack(self, p)
    stats["unpack_pull"].append((t1 - t0) * 1e3)
    stats["unpack_host"].append((time.perf_counter() - t1) * 1e3)
    return r
T.Tracker._unpack_fused = unpack

orig_make = T.Tracker._make_frame
def make(self, img, timestamp, depth_map=None, right_img=None):
    t0 = time.perf_counter()
    feats = self.extractor(img)
    t1 = time.perf_counter()
    stats["extract_dispatch"].append((t1 - t0) * 1e3)
    r = orig_make(self, img, timestamp, depth_map, right_img)
    stats["make_rest"].append((time.perf_counter() - t1) * 1e3)
    return r
T.Tracker._make_frame = make

# NOTE: orig_make calls self.extractor(img) again -> double extraction
# dispatch; acceptable for diagnosis (adds enqueue cost only).

orig_handle = T.Tracker._handle_result
def handle(self, frame, ok):
    t0 = time.perf_counter()
    r = orig_handle(self, frame, ok)
    stats["handle_result"].append((time.perf_counter() - t0) * 1e3)
    return r
T.Tracker._handle_result = handle

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
for k, v in stats.items():
    a = np.array(v)
    print(f"{k:18s} n={len(v):3d} mean={a.mean():7.2f} med={np.median(a):7.2f} "
          f"p90={np.percentile(a, 90):7.2f} max={a.max():7.2f}")
slam.shutdown()
