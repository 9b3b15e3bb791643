"""Shared pose-graph test fixtures, vectorized.

The original fixtures built K=2000 problems with Python loops of eager jax
calls (one `sim3_compose` dispatch per edge / per chain link) — ~150 s of
pure dispatch overhead per test on CPU, dwarfing the actual solve (~2.5 s).
Everything here is one batched call or one `lax.scan`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import geometry as geo


def circle_poses(K, radius=5.0):
    """Ground-truth Sim3 keyframe poses around a loop (batched)."""
    a = 2 * np.pi * np.arange(K, dtype=np.float32) / K
    zeros = np.zeros_like(a)
    ones = np.ones_like(a)
    Rwc = np.stack([
        np.stack([np.cos(a), zeros, np.sin(a)], -1),
        np.stack([zeros, ones, zeros], -1),
        np.stack([-np.sin(a), zeros, np.cos(a)], -1),
    ], axis=1)                                             # (K, 3, 3)
    C = np.stack(
        [radius * np.sin(a), zeros, radius * (1 - np.cos(a))], -1)
    Rcw = np.swapaxes(Rwc, 1, 2)
    t = -np.einsum("kij,kj->ki", Rcw, C)
    return np.asarray(geo.sim3_make(
        jnp.ones(K, jnp.float32), jnp.asarray(Rcw), jnp.asarray(t)))


def corridor_sim3(K):
    """KITTI-like forward corridor with gentle yaw, as (K, 8) Sim3."""
    i = np.arange(K, dtype=np.float32)
    yaw = 0.0006 * i
    zeros = np.zeros_like(i)
    ones = np.ones_like(i)
    Rwc = np.stack([
        np.stack([np.cos(yaw), zeros, np.sin(yaw)], -1),
        np.stack([zeros, ones, zeros], -1),
        np.stack([-np.sin(yaw), zeros, np.cos(yaw)], -1),
    ], axis=1)
    C = np.stack([0.3 * np.sin(0.01 * i), zeros, 0.8 * i], -1)
    Rcw = np.swapaxes(Rwc, 1, 2)
    t = -np.einsum("kij,kj->ki", Rcw, C)
    return np.asarray(geo.sim3_make(
        jnp.ones(K, jnp.float32), jnp.asarray(Rcw), jnp.asarray(t)))


def relative_edges(S_true, ei, ej):
    """Measured S_i * S_j^-1 for every edge, one batched call -> (E, 8)."""
    Si = jnp.asarray(S_true)[np.asarray(ei)]
    Sj = jnp.asarray(S_true)[np.asarray(ej)]
    return np.asarray(geo.sim3_compose(Si, geo.sim3_inverse(Sj)))


@jax.jit
def _integrate(Sij_chain, S0, drift):
    Sd = geo.sim3_exp(drift)

    def step(prev, Sij):
        nxt = geo.sim3_compose(Sd, geo.sim3_compose(Sij, prev))
        return nxt, nxt

    _, rest = jax.lax.scan(step, S0, Sij_chain)
    return jnp.concatenate([S0[None], rest], axis=0)


def integrate_drift(Sij_chain, S0, drift):
    """Open-loop odometry integration with per-link drift, one lax.scan.

    S_init[k+1] = exp(drift) * Sij[k] * S_init[k], S_init[0] = S0.
    Sij_chain: (K-1, 8); returns (K, 8).
    """
    return np.asarray(_integrate(
        jnp.asarray(Sij_chain), jnp.asarray(S0), jnp.asarray(drift)))
