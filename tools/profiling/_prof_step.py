"""Standalone timing of the fused frame step: dispatch->block latency and
streamed throughput."""
import time
import numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.tracking import Tracker
from orbslam2_tpu.map.state import MapState

H, W = 480, 640
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
m = MapState.allocate(cfg)
tr = Tracker(cfg, m)
from orbslam2_tpu.tracking import _build_fused_frame_step
tr._frame_step = _build_fused_frame_step(tr.extractor, False, 2, True)
ds = tr._dev_scalars
P = tr.local_point_cap
rng = np.random.default_rng(0)
buf = dict(
    pos=jnp.asarray(np.concatenate([rng.uniform(-2,2,(P,2)), rng.uniform(4,9,(P,1))],1).astype(np.float32)),
    desc=jnp.asarray(rng.integers(0,256,(P,32)).astype(np.uint8)),
    valid=jnp.asarray(np.ones(P,bool)),
    normal=jnp.asarray(np.tile(np.float32([0,0,-1]),(P,1))),
    dmin=jnp.asarray(np.full(P,0.1,np.float32)),
    dmax=jnp.asarray(np.full(P,50.0,np.float32)),
)
img = jnp.asarray(rng.integers(0,256,(H,W)).astype(np.float32))
d16 = jnp.asarray((rng.uniform(1,5,(H//2,W//2))*1000).astype(np.uint16))
I = jnp.eye(4, dtype=jnp.float32)

def call():
    return tr._frame_step(tr.cam, img, d16, ds["depth_scale"], I, I, ds["true_"],
        buf["pos"], buf["desc"], buf["valid"], buf["normal"], buf["dmin"], buf["dmax"],
        ds["th_depth"], ds["radius"], ds["scale_factor"],
        cfg.extractor.n_levels, cfg.tracking.min_inliers_track)

out = call(); jax.block_until_ready(out[1])
# latency: dispatch + block each time
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    out = call()
    jax.block_until_ready(out[1])
    ts.append((time.perf_counter()-t0)*1e3)
print("latency dispatch+block:", [round(t,1) for t in ts])
# throughput: stream 50, block once
t0 = time.perf_counter()
for _ in range(50):
    out = call()
jax.block_until_ready(out[1])
print(f"streamed: {(time.perf_counter()-t0)/50*1e3:.2f} ms/frame")
# with async copies like production
t0 = time.perf_counter()
for _ in range(50):
    packed, tcw, dev, pack = call()
    packed.copy_to_host_async(); pack.copy_to_host_async(); dev["desc"].copy_to_host_async()
jax.block_until_ready(tcw)
print(f"streamed+3copies: {(time.perf_counter()-t0)/50*1e3:.2f} ms/frame")
# pull pattern: commit 2 behind
from collections import deque
q = deque()
ts=[]
t0=time.perf_counter()
for i in range(50):
    packed, tcw, dev, pack = call()
    packed.copy_to_host_async()
    q.append(packed)
    if len(q) > 2:
        p = q.popleft()
        ta = time.perf_counter()
        np.asarray(p)
        ts.append((time.perf_counter()-ta)*1e3)
dt=(time.perf_counter()-t0)/50*1e3
a=np.array(ts)
print(f"pipelined loop: {dt:.2f} ms/frame; pull med={np.median(a):.2f} p90={np.percentile(a,90):.2f}")
