"""Bisect the fused step's 29.5 ms: which ingredient makes it slow?"""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import orb, geometry as geo
import orbslam2_tpu.tracking as T

H, W = 480, 640
cfge = ExtractorConfig(n_features=1000, n_levels=8)
ext = orb.OrbExtractor(cfge, H, W)
cam = Camera.create(fx=520., fy=520., cx=W/2, cy=H/2, width=W, height=H, bf=52.0)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
d16 = jnp.asarray((rng.uniform(1, 5, (H//2, W//2)) * 1000).astype(np.uint16))
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
tru = jnp.asarray(True)
sf = jnp.float32(cfge.scale_factor)
td = jnp.float32(40.0); rad = jnp.float32(15.0); dsc = jnp.float32(1e-3)

def stream(fn, n=30):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

# A: extraction + cascade in ONE jit, minimal outputs
@functools.partial(jax.jit, static_argnames=("n_levels", "mi"))
def stepA(cam, img, pos, desc, valid, normal, dmin, dmax, td, rad, sf, n_levels, mi):
    f = ext._build(img)
    ur = jnp.full((f.xy.shape[0],), -1.0, jnp.float32)
    dep = ur
    packed, Tcw = T._fused_cascade(cam, I, pos, desc, valid, normal, dmin, dmax,
        f.xy, f.desc, f.octave, f.valid, ur, dep, td, rad, sf, n_levels, mi)
    return packed
print(f"A extract+cascade 1 jit, 1 out: {stream(lambda: stepA(cam, img, buf['pos'], buf['desc'], buf['valid'], buf['normal'], buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30)):7.2f} ms")

# B: + chained prediction math
@functools.partial(jax.jit, static_argnames=("n_levels", "mi"))
def stepB(cam, img, Tp, Tp2, hm, pos, desc, valid, normal, dmin, dmax, td, rad, sf, n_levels, mi):
    f = ext._build(img)
    ur = jnp.full((f.xy.shape[0],), -1.0, jnp.float32)
    Tp = geo.se3_orthonormalize(Tp); Tp2 = geo.se3_orthonormalize(Tp2)
    vel = Tp @ geo.se3_inverse(Tp2)
    Tpred = jnp.where(hm, vel @ Tp, Tp)
    r = jnp.where(hm, rad, 2 * rad)
    packed, Tcw = T._fused_cascade(cam, Tpred, pos, desc, valid, normal, dmin, dmax,
        f.xy, f.desc, f.octave, f.valid, ur, ur, td, r, sf, n_levels, mi)
    return packed, geo.se3_orthonormalize(Tcw)
print(f"B + chain math:                 {stream(lambda: stepB(cam, img, I, I, tru, buf['pos'], buf['desc'], buf['valid'], buf['normal'], buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30)):7.2f} ms")

# C: + depth virtual right
@functools.partial(jax.jit, static_argnames=("n_levels", "mi"))
def stepC(cam, img, d16, dscale, Tp, Tp2, hm, pos, desc, valid, normal, dmin, dmax, td, rad, sf, n_levels, mi):
    f = ext._build(img)
    Hs, Ws = d16.shape
    xi = jnp.clip(jnp.round(f.xy[:, 0] * 0.5).astype(jnp.int32), 0, Ws - 1)
    yi = jnp.clip(jnp.round(f.xy[:, 1] * 0.5).astype(jnp.int32), 0, Hs - 1)
    d = d16.reshape(-1)[yi * Ws + xi].astype(jnp.float32) * dscale
    ok = f.valid & (d > 0)
    dep = jnp.where(ok, d, -1.0)
    ur = jnp.where(ok, f.xy[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    Tp = geo.se3_orthonormalize(Tp); Tp2 = geo.se3_orthonormalize(Tp2)
    vel = Tp @ geo.se3_inverse(Tp2)
    Tpred = jnp.where(hm, vel @ Tp, Tp)
    r = jnp.where(hm, rad, 2 * rad)
    packed, Tcw = T._fused_cascade(cam, Tpred, pos, desc, valid, normal, dmin, dmax,
        f.xy, f.desc, f.octave, f.valid, ur, dep, td, r, sf, n_levels, mi)
    return packed, geo.se3_orthonormalize(Tcw)
print(f"C + virtual right:              {stream(lambda: stepC(cam, img, d16, dsc, I, I, tru, buf['pos'], buf['desc'], buf['valid'], buf['normal'], buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30)):7.2f} ms")

# D: + host_pack + dev outputs (the full production signature)
@functools.partial(jax.jit, static_argnames=("n_levels", "mi"))
def stepD(cam, img, d16, dscale, Tp, Tp2, hm, pos, desc, valid, normal, dmin, dmax, td, rad, sf, n_levels, mi):
    f = ext._build(img)
    Hs, Ws = d16.shape
    xi = jnp.clip(jnp.round(f.xy[:, 0] * 0.5).astype(jnp.int32), 0, Ws - 1)
    yi = jnp.clip(jnp.round(f.xy[:, 1] * 0.5).astype(jnp.int32), 0, Hs - 1)
    d = d16.reshape(-1)[yi * Ws + xi].astype(jnp.float32) * dscale
    ok = f.valid & (d > 0)
    dep = jnp.where(ok, d, -1.0)
    ur = jnp.where(ok, f.xy[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    Tp = geo.se3_orthonormalize(Tp); Tp2 = geo.se3_orthonormalize(Tp2)
    vel = Tp @ geo.se3_inverse(Tp2)
    Tpred = jnp.where(hm, vel @ Tp, Tp)
    r = jnp.where(hm, rad, 2 * rad)
    packed, Tcw = T._fused_cascade(cam, Tpred, pos, desc, valid, normal, dmin, dmax,
        f.xy, f.desc, f.octave, f.valid, ur, dep, td, r, sf, n_levels, mi)
    hp = jnp.stack([f.xy[:,0], f.xy[:,1], f.angle, f.octave.astype(jnp.float32),
                    f.valid.astype(jnp.float32), ur, dep], axis=1)
    devd = dict(xy=f.xy, desc=f.desc, octave=f.octave, angle=f.angle,
                valid=f.valid, ur=ur, depth=dep)
    return packed, geo.se3_orthonormalize(Tcw), devd, hp
print(f"D full production signature:    {stream(lambda: stepD(cam, img, d16, dsc, I, I, tru, buf['pos'], buf['desc'], buf['valid'], buf['normal'], buf['dmin'], buf['dmax'], td, rad, sf, cfge.n_levels, 30)):7.2f} ms")
