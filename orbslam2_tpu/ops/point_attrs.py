"""Batched map-point attribute refresh on device.

Computes the reference's per-point derived attributes
(†MapPoint::ComputeDistinctiveDescriptors — the min-median-Hamming
distinctive descriptor — and †MapPoint::UpdateNormalAndDepth — mean viewing
normal + scale-invariance band) for a batch of points in ONE jitted program
reading the device-resident keyframe mirror.

The host-numpy fallback in map/state.py computes the same thing; at
refresh-sized batches (P≈1000 points x O=32 observation slots) the host pass
costs 100-800 ms of GIL-held numpy on the mapping worker, which freezes the
tracking thread for its whole duration. Here the same batch is a ~1 ms MXU
matmul plus one overlapped D2H pull.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .orb import unpack_bits

BIG = jnp.int32(10000)


@functools.partial(jax.jit, static_argnames=())
def point_attributes(
    kf_desc,      # (K, N, 32) u8   device mirror
    kf_octave,    # (K, N) i32      device mirror
    kf_pose,      # (K, 4, 4) f32   uploaded per call (poses mutate)
    obs_kf,       # (P, O) i16/i32  -1 = empty slot (O compacted per batch)
    obs_ft,       # (P, O) i16/i32
    mp_pos,       # (P, 3) f32
    mp_ref_kf,    # (P,) i32
    scale_factor, # () f32
    n_levels_m1,  # () f32  (n_levels - 1)
):
    """Returns (desc (P,32) u8, normal (P,3) f32, dmin (P,), dmax (P,),
    ref_kf (P,) i32) for every row; rows with no valid observation return
    zeros and must be masked by the caller."""
    obs_kf = obs_kf.astype(jnp.int32)   # i16 on the wire (upload size)
    obs_ft = obs_ft.astype(jnp.int32)
    P, O = obs_kf.shape
    sel = obs_kf >= 0
    kfs = jnp.maximum(obs_kf, 0)
    fts = jnp.maximum(obs_ft, 0)

    # --- distinctive descriptor: min median pairwise Hamming
    descs = kf_desc[kfs, fts]                               # (P, O, 32)
    bits = unpack_bits(descs.reshape(P * O, 32)).reshape(P, O, 256)
    bitsf = bits.astype(jnp.float32)
    # exact on {0,1} under bf16 MXU accumulation (sums <= 256)
    G = jnp.einsum("poc,pqc->poq", bitsf, bitsf,
                   precision=jax.lax.Precision.DEFAULT)     # (P, O, O)
    s = bitsf.sum(-1)
    dm = (s[:, :, None] + s[:, None, :] - 2.0 * G).astype(jnp.int32)
    dm = jnp.where(sel[:, :, None] & sel[:, None, :], dm, BIG)
    dm_sorted = jnp.sort(dm, axis=2)
    n_obs = sel.sum(1)
    med_idx = jnp.maximum((n_obs - 1) // 2, 0)              # (P,)
    med = jnp.take_along_axis(
        dm_sorted, med_idx[:, None, None].repeat(O, 1), axis=2
    )[:, :, 0]                                              # (P, O)
    med = jnp.where(sel, med, BIG)
    best = jnp.argmin(med, axis=1)
    out_desc = jnp.take_along_axis(
        descs, best[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]

    # --- mean viewing normal. Camera centers are computed ONCE PER
    # KEYFRAME then gathered per component: a direct kf_pose[kfs] gather
    # materializes a (P, O, 4, 4) tensor whose trailing (4, 4) tile pads
    # 128x on TPU (~270 MB at refresh batch sizes).
    Rk = kf_pose[:, :3, :3]
    tk = kf_pose[:, :3, 3]
    centers_k = -jnp.einsum("kji,kj->ki", Rk, tk)           # (K, 3) = -R^T t
    cg = centers_k.T[:, kfs]                                # (3, P, O)
    vec = mp_pos.T[:, :, None] - cg                         # (3, P, O)
    vlen = jnp.sqrt(jnp.maximum(
        vec[0] * vec[0] + vec[1] * vec[1] + vec[2] * vec[2], 1e-18))
    selw = jnp.where(sel, 1.0 / vlen, 0.0)                  # (P, O)
    n = jnp.stack([(vec[i] * selw).sum(1) for i in range(3)], axis=1)
    n = n / jnp.maximum(n_obs[:, None], 1)
    out_normal = n / jnp.maximum(
        jnp.linalg.norm(n, axis=1, keepdims=True), 1e-9
    )

    # --- scale band from the reference-KF observation (fall back to the
    # first live observation when the reference KF no longer observes)
    is_ref = sel & (obs_kf == mp_ref_kf[:, None])
    has_ref = is_ref.any(1)
    j = jnp.where(has_ref, jnp.argmax(is_ref, axis=1), jnp.argmax(sel, axis=1))
    out_ref = jnp.take_along_axis(obs_kf, j[:, None], axis=1)[:, 0]
    dist = jnp.take_along_axis(vlen, j[:, None], axis=1)[:, 0]
    kj = jnp.take_along_axis(kfs, j[:, None], axis=1)[:, 0]
    fj = jnp.take_along_axis(fts, j[:, None], axis=1)[:, 0]
    level = kf_octave[kj, fj].astype(jnp.float32)
    # †UpdateNormalAndDepth: mfMaxDistance = dist * sf^level (UNscaled; the
    # 0.8/1.2 margins live in the frustum gate — see map/state.py)
    dmax = dist * scale_factor ** level
    dmin = dmax / scale_factor ** n_levels_m1

    # packed single D2H: desc as f32 rides along (u8 cast on host)
    packed = jnp.concatenate([
        out_desc.astype(jnp.float32),
        out_normal,
        dmin[:, None], dmax[:, None],
        out_ref.astype(jnp.float32)[:, None],
    ], axis=1)                                              # (P, 38)
    return packed
