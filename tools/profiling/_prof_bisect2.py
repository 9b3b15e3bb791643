"""Per-call behavior of composed programs + cross-check with the
production builder in one process."""
import time, functools
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
P = 8192
buf = dict(
    pos=jnp.asarray(np.concatenate([rng.uniform(-2,2,(P,2)), rng.uniform(4,9,(P,1))],1).astype(np.float32)),
    desc=jnp.asarray(rng.integers(0,256,(P,32)).astype(np.uint8)),
    valid=jnp.asarray(np.ones(P,bool)),
    normal=jnp.asarray(np.tile(np.float32([0,0,-1]),(P,1))),
    dmin=jnp.asarray(np.full(P,0.1,np.float32)),
    dmax=jnp.asarray(np.full(P,50.0,np.float32)),
)
I = jnp.eye(4, dtype=jnp.float32)
sf = jnp.float32(cfge.scale_factor)
td = jnp.float32(40.0); rad = jnp.float32(15.0)

def percall(fn, n=8, label=""):
    r = fn(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: " + " ".join(f"{t:7.1f}" for t in ts), flush=True)

@functools.partial(jax.jit, static_argnames=("n_levels", "mi"))
def stepA(cam, img, pos, desc, valid, normal, dmin, dmax, td, rad, sf, n_levels, mi):
    f = ext._build(img)
    ur = jnp.full((f.xy.shape[0],), -1.0, jnp.float32)
    packed, Tcw = T._fused_cascade(cam, I, pos, desc, valid, normal, dmin, dmax,
        f.xy, f.desc, f.octave, f.valid, ur, ur, td, rad, sf, n_levels, mi)
    return packed

percall(lambda: stepA(cam, img, buf['pos'], buf['desc'], buf['valid'], buf['normal'], buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30), label="stepA     ")

# production builder in the same process
fs = T._build_fused_frame_step(ext, False, 2, False)
dummy16 = jnp.zeros((1, 1), jnp.uint16)
dscale = jnp.float32(1e-3)
tru = jnp.asarray(True)
percall(lambda: fs(cam, img, dummy16, dscale, I, I, tru,
                   buf['pos'], buf['desc'], buf['valid'], buf['normal'],
                   buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30),
        label="production")

# extraction alone, per-call
percall(lambda: ext._extract(img), label="extract   ")
