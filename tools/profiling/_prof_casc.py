"""Cascade cost decomposition with DEAD-CODE-PROOF timing: per-call
dispatch+block, minus measured RTT."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import orb, matching
import orbslam2_tpu.tracking as T

H, W = 480, 640
cfge = ExtractorConfig(n_features=1000, n_levels=8)
cam = Camera.create(fx=520., fy=520., cx=W/2, cy=H/2, width=W, height=H, bf=52.0)
rng = np.random.default_rng(0)
N = cfge.max_keypoints

def percall(fn, n=6):
    r = fn(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))

# RTT baseline
g = jax.jit(lambda x: x + 1)
x0 = jnp.zeros(256, jnp.float32)
rtt = percall(lambda: g(x0))
print(f"RTT baseline: {rtt:.1f} ms")

kp_xy = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
kp_desc = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.uint8))
kp_oct = jnp.zeros(N, jnp.int32)
kp_val = jnp.asarray(np.ones(N, bool))
kp_ur = jnp.full((N,), -1.0, jnp.float32)
I = jnp.eye(4, dtype=jnp.float32)
sf = jnp.float32(cfge.scale_factor)

for P in (2048, 8192):
    mp = dict(
        pos=jnp.asarray(np.concatenate([rng.uniform(-2,2,(P,2)), rng.uniform(4,9,(P,1))],1).astype(np.float32)),
        desc=jnp.asarray(rng.integers(0,256,(P,32)).astype(np.uint8)),
        valid=jnp.asarray(np.ones(P,bool)),
        normal=jnp.asarray(np.tile(np.float32([0,0,-1]),(P,1))),
        dmin=jnp.asarray(np.full(P,0.1,np.float32)),
        dmax=jnp.asarray(np.full(P,50.0,np.float32)),
    )
    full = percall(lambda: T.track_frame_fused(cam, I, mp["pos"], mp["desc"], mp["valid"],
        mp["normal"], mp["dmin"], mp["dmax"], kp_xy, kp_desc, kp_oct, kp_val, kp_ur, kp_ur,
        jnp.float32(40.0), jnp.float32(15.0), sf, cfge.n_levels, 30))
    print(f"P={P}: full cascade {full:.1f} ms  (exec ~{full-rtt:.1f})")

    # single pass (project+match+pose-opt)
    one = jax.jit(functools.partial(T._project_match_opt, n_levels=cfge.n_levels,
                                    max_dist=matching.TH_HIGH, nn_ratio=0.9,
                                    do_pose_opt=True))
    r1 = percall(lambda: one(cam, I, mp["pos"], mp["desc"], mp["valid"], mp["normal"],
        mp["dmin"], mp["dmax"], kp_xy, kp_desc, kp_oct, kp_val, kp_ur,
        jnp.float32(15.0), sf))
    print(f"P={P}: one pass w/opt {r1:.1f} ms (exec ~{r1-rtt:.1f})")
    noopt = jax.jit(functools.partial(T._project_match_opt, n_levels=cfge.n_levels,
                                      max_dist=matching.TH_HIGH, nn_ratio=0.9,
                                      do_pose_opt=False))
    r0 = percall(lambda: noopt(cam, I, mp["pos"], mp["desc"], mp["valid"], mp["normal"],
        mp["dmin"], mp["dmax"], kp_xy, kp_desc, kp_oct, kp_val, kp_ur,
        jnp.float32(15.0), sf))
    print(f"P={P}: one pass no-opt {r0:.1f} ms (exec ~{r0-rtt:.1f})")
