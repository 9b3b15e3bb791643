"""Decompose fused-step device time: extraction vs cascade at P=2048/4096/8192."""
import time
import numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import orb
import orbslam2_tpu.tracking as T

H, W = 480, 640
cfge = ExtractorConfig(n_features=1000, n_levels=8)
ext = orb.OrbExtractor(cfge, H, W)
cam = Camera.create(fx=520., fy=520., cx=W/2, cy=H/2, width=W, height=H, bf=52.0)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))

def stream(fn, n=30):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

print(f"extract:            {stream(lambda: ext._extract(img)):7.2f} ms/frame")

feats = ext._extract(img)
jax.block_until_ready(feats)
N = cfge.max_keypoints
kp_ur = jnp.full((N,), -1.0, jnp.float32)
kp_depth = jnp.full((N,), -1.0, jnp.float32)
for P in (2048, 4096, 8192):
    buf_pos = jnp.asarray(np.concatenate([rng.uniform(-2,2,(P,2)), rng.uniform(4,9,(P,1))],1).astype(np.float32))
    buf = dict(
        pos=buf_pos,
        desc=jnp.asarray(rng.integers(0,256,(P,32)).astype(np.uint8)),
        valid=jnp.asarray(np.ones(P,bool)),
        normal=jnp.asarray(np.tile(np.float32([0,0,-1]),(P,1))),
        dmin=jnp.asarray(np.full(P,0.1,np.float32)),
        dmax=jnp.asarray(np.full(P,50.0,np.float32)),
    )
    I = jnp.eye(4, dtype=jnp.float32)
    def casc():
        return T.track_frame_fused(cam, I, buf["pos"], buf["desc"], buf["valid"],
            buf["normal"], buf["dmin"], buf["dmax"],
            feats.xy, feats.desc, feats.octave, feats.valid, kp_ur, kp_depth,
            jnp.float32(40.0), jnp.float32(15.0), jnp.float32(cfge.scale_factor),
            cfge.n_levels, 30)
    print(f"cascade P={P:5d}:    {stream(casc):7.2f} ms/frame")
