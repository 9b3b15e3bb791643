"""Synthetic point_attrs probe: upload + kernel cost at production shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from orbslam2_tpu.ops import point_attrs


def T(name, fn, reps=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")


rng = np.random.default_rng(0)
Kc, N = 64, 1504          # keyframe mirror: 64 KFs x 1504 feats
kf_desc = jnp.asarray(rng.integers(0, 256, (Kc, N, 32)).astype(np.uint8))
kf_octave = jnp.asarray(rng.integers(0, 8, (Kc, N)).astype(np.int32))
kf_pose_np = np.tile(np.eye(4, dtype=np.float32), (Kc, 1, 1))
kf_pose_np[:, 0, 3] = np.linspace(0, 2, Kc)

for Pb, Ob in ((1024, 8), (2048, 16), (2048, 64)):
    obs_kf = rng.integers(0, Kc, (Pb, Ob)).astype(np.int16)
    obs_ft = rng.integers(0, N, (Pb, Ob)).astype(np.int16)
    obs_kf[rng.random((Pb, Ob)) < 0.3] = -1
    pos = rng.normal(size=(Pb, 3)).astype(np.float32) + np.float32([0, 0, 6])
    ref = rng.integers(0, Kc, Pb).astype(np.int32)

    def upload():
        return (jnp.asarray(kf_pose_np), jnp.asarray(obs_kf),
                jnp.asarray(obs_ft), jnp.asarray(pos), jnp.asarray(ref))

    ups = upload()

    def kern():
        return point_attrs.point_attributes(
            kf_desc, kf_octave, *ups, jnp.float32(1.2), jnp.float32(7.0))

    T(f"P={Pb} O={Ob} uploads(pipe)", upload)
    T(f"P={Pb} O={Ob} kernel(pipe)", kern)
