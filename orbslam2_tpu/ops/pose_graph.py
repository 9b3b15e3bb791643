"""7-DoF Sim3 pose-graph (essential graph) optimization.

Re-design of †src/Optimizer.cc:OptimizeEssentialGraph (SURVEY §2.6): after a
loop closure, every keyframe pose becomes a Sim3 vertex (scale fixed to 1
for stereo/RGB-D), connected by relative-Sim3 edges from the essential graph
(spanning tree + loop edges + strong covisibility >= 100) with identity
information; 20 LM iterations; translation divided by scale at write-back.

g2o's graph machinery is replaced by: batched edge residuals
e = log(S_ij S_j S_i^-1), per-edge (7, 14) Jacobians via forward-mode
autodiff (no hand-derived Sim3 adjoints to get wrong), dense normal-equation
assembly by scatter-add, one Cholesky of the (7K, 7K) system per iteration.
K is at most a few hundred — dense is the TPU-friendly regime.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo


def _edge_residual(xi_i, xi_j, S_i, S_j, S_ij):
    """e = log( S_ij * (exp(xi_j) S_j) * (exp(xi_i) S_i)^-1 )  (7,)"""
    Si = geo.sim3_compose(geo.sim3_exp(xi_i), S_i)
    Sj = geo.sim3_compose(geo.sim3_exp(xi_j), S_j)
    E = geo.sim3_compose(S_ij, geo.sim3_compose(Sj, geo.sim3_inverse(Si)))
    return geo.sim3_log(E)


def _edge_lin(S_i, S_j, S_ij):
    """Residual at xi=0 and Jacobians wrt (xi_i, xi_j): (7,), (7,7), (7,7)."""
    z = jnp.zeros(7, S_i.dtype)
    r = _edge_residual(z, z, S_i, S_j, S_ij)
    Ji = jax.jacfwd(_edge_residual, argnums=0)(z, z, S_i, S_j, S_ij)
    Jj = jax.jacfwd(_edge_residual, argnums=1)(z, z, S_i, S_j, S_ij)
    return r, Ji, Jj


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray  # (K, 8) optimized Sim3 vectors
    cost: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_pose_graph(
    S_init: jnp.ndarray,     # (K, 8) Sim3 per keyframe (Scw)
    fixed: jnp.ndarray,      # (K,) bool — held constant (loop KF)
    valid: jnp.ndarray,      # (K,) bool — live keyframes
    edge_i: jnp.ndarray,     # (E,) int32
    edge_j: jnp.ndarray,     # (E,) int32
    edge_Sij: jnp.ndarray,   # (E, 8) measured S_i * S_j^-1
    edge_valid: jnp.ndarray,  # (E,)
    iters: int = 20,
    fix_scale: bool = False,
) -> PoseGraphResult:
    K = S_init.shape[0]
    D = 7
    ew = edge_valid.astype(S_init.dtype)

    def total_cost(S):
        r = jax.vmap(
            lambda i, j, Sij: _edge_residual(
                jnp.zeros(D, S.dtype), jnp.zeros(D, S.dtype), S[i], S[j], Sij
            )
        )(edge_i, edge_j, edge_Sij)
        return jnp.sum(jnp.sum(r * r, axis=1) * ew)

    def step(S, lam):
        r, Ji, Jj = jax.vmap(
            lambda i, j, Sij: _edge_lin(S[i], S[j], Sij)
        )(edge_i, edge_j, edge_Sij)
        rw = r * ew[:, None]
        Jiw = Ji * ew[:, None, None]
        Jjw = Jj * ew[:, None, None]

        H = jnp.zeros((K, K, D, D), S.dtype)
        H = H.at[edge_i, edge_i].add(jnp.einsum("eri,erj->eij", Jiw, Ji))
        H = H.at[edge_j, edge_j].add(jnp.einsum("eri,erj->eij", Jjw, Jj))
        H = H.at[edge_i, edge_j].add(jnp.einsum("eri,erj->eij", Jiw, Jj))
        H = H.at[edge_j, edge_i].add(jnp.einsum("eri,erj->eij", Jjw, Ji))
        b = jnp.zeros((K, D), S.dtype)
        b = b.at[edge_i].add(jnp.einsum("eri,er->ei", Jiw, r))
        b = b.at[edge_j].add(jnp.einsum("eri,er->ei", Jjw, r))

        # fixed / dead vertices -> identity rows
        freeze = fixed | ~valid
        H = jnp.where(freeze[:, None, None, None], 0.0, H)
        H = jnp.where(freeze[None, :, None, None], 0.0, H)
        diag = jnp.arange(K)
        H = H.at[diag, diag].add(
            jnp.where(freeze, 1.0, 0.0)[:, None, None] * jnp.eye(D, dtype=S.dtype)
        )
        b = jnp.where(freeze[:, None], 0.0, b)
        H = H.at[diag, diag].add(lam * jnp.eye(D, dtype=S.dtype)[None])

        Hm = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
        dx = -jnp.linalg.solve(Hm, b.reshape(-1)).reshape(K, D)
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)  # †bFixScale: no scale drift for stereo
        dx = jnp.where(freeze[:, None], 0.0, dx)
        S_new = jax.vmap(lambda x, s: geo.sim3_compose(geo.sim3_exp(x), s))(dx, S)
        return S_new

    def body(_, carry):
        S, lam, cost = carry
        S_new = step(S, lam)
        cost_new = total_cost(S_new)
        accept = cost_new < cost
        S = jnp.where(accept, S_new, S)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, cost_new, cost)
        return S, lam, cost

    cost0 = total_cost(S_init)
    S, _, cost = jax.lax.fori_loop(0, iters, body, (S_init, 1e-6, cost0))
    return PoseGraphResult(poses=S, cost=cost)
