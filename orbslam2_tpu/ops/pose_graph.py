"""7-DoF Sim3 pose-graph (essential graph) optimization.

Re-design of †src/Optimizer.cc:OptimizeEssentialGraph (SURVEY §2.6): after a
loop closure, every keyframe pose becomes a Sim3 vertex (scale fixed to 1
for stereo/RGB-D), connected by relative-Sim3 edges from the essential graph
(spanning tree + loop edges + strong covisibility >= 100) with identity
information; 20 LM iterations; translation divided by scale at write-back.

g2o's graph machinery is replaced by: batched edge residuals
e = log(S_ij S_j S_i^-1), per-edge (7, 14) Jacobians via forward-mode
autodiff (no hand-derived Sim3 adjoints to get wrong), then one of two
solvers chosen by problem size:

- K <= DENSE_MAX_K: dense normal equations, one Cholesky of the (7K, 7K)
  system per LM iteration — the TPU-friendly regime for loop-sized graphs;
- larger K (KITTI scale, 2000+ keyframes): matrix-free block-Jacobi
  preconditioned conjugate gradients — the Hessian is never materialized;
  each CG matvec is per-edge 7x7 block products + two segment-sums over
  the (sorted) edge lists, so memory stays O(E) and the solve stays on
  the VPU/MXU instead of a serialized (K, K) scatter.
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


DENSE_MAX_K = 384   # beyond this the dense (7K)^2 Cholesky loses to CG


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "solver"))
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
    solver: str = "auto",   # auto | dense | cg
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

    freeze = fixed | ~valid
    use_dense = (K <= DENSE_MAX_K) if solver == "auto" else (solver == "dense")

    def step(S, lam):
        r, Ji, Jj = jax.vmap(
            lambda i, j, Sij: _edge_lin(S[i], S[j], Sij)
        )(edge_i, edge_j, edge_Sij)
        Jiw = Ji * ew[:, None, None]
        Jjw = Jj * ew[:, None, None]
        # per-edge normal-equation blocks
        Hii = jnp.einsum("eri,erj->eij", Jiw, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jjw, Jj)
        Hij = jnp.einsum("eri,erj->eij", Jiw, Jj)
        bi = jnp.einsum("eri,er->ei", Jiw, r)
        bj = jnp.einsum("eri,er->ei", Jjw, r)

        b = (
            jnp.zeros((K, D), S.dtype).at[edge_i].add(bi).at[edge_j].add(bj)
        )
        b = jnp.where(freeze[:, None], 0.0, b)
        diag = jnp.arange(K)

        if use_dense:
            H = jnp.zeros((K, K, D, D), S.dtype)
            H = H.at[edge_i, edge_i].add(Hii)
            H = H.at[edge_j, edge_j].add(Hjj)
            H = H.at[edge_i, edge_j].add(Hij)
            H = H.at[edge_j, edge_i].add(Hij.transpose(0, 2, 1))
            # fixed / dead vertices -> identity rows
            H = jnp.where(freeze[:, None, None, None], 0.0, H)
            H = jnp.where(freeze[None, :, None, None], 0.0, H)
            H = H.at[diag, diag].add(
                jnp.where(freeze, 1.0, 0.0)[:, None, None]
                * jnp.eye(D, dtype=S.dtype)
            )
            H = H.at[diag, diag].add(lam * jnp.eye(D, dtype=S.dtype)[None])
            Hm = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
            dx = -jnp.linalg.solve(Hm, b.reshape(-1)).reshape(K, D)
        else:
            # ---- matrix-free block-Jacobi PCG (Hessian never formed) ----
            Dblk = (
                jnp.zeros((K, D, D), S.dtype)
                .at[edge_i].add(Hii)
                .at[edge_j].add(Hjj)
            )
            Dblk = Dblk + lam * jnp.eye(D, dtype=S.dtype)[None]
            Dblk = jnp.where(
                freeze[:, None, None], jnp.eye(D, dtype=S.dtype)[None], Dblk
            )
            Minv = jnp.linalg.inv(
                Dblk + 1e-6 * jnp.eye(D, dtype=S.dtype)[None]
            )

            def matvec(x):
                xi = x[edge_i]
                xj = x[edge_j]
                yi = jnp.einsum("eij,ej->ei", Hii, xi) + jnp.einsum(
                    "eij,ej->ei", Hij, xj
                )
                yj = jnp.einsum("eji,ej->ei", Hij, xi) + jnp.einsum(
                    "eij,ej->ei", Hjj, xj
                )
                # frozen columns contribute nothing automatically: x stays
                # exactly 0 on frozen rows (b=0 there, matvec is identity
                # there, the preconditioner is identity there)
                y = (
                    jnp.zeros((K, D), S.dtype)
                    .at[edge_i].add(yi)
                    .at[edge_j].add(yj)
                )
                y = y + lam * x
                return jnp.where(freeze[:, None], x, y)

            # frozen rows stay exactly 0 throughout (b rows are 0 and
            # matvec maps them to themselves). Information travels ONE graph
            # hop per CG iteration, so the budget must cover the graph
            # diameter (a 2000-KF odometry chain needs ~2000 iterations for
            # a loop correction to reach the far end); the while_loop exits
            # early once the preconditioned residual collapses.
            cg_max = min(4 * K, 12000)

            def cg_cond(carry):
                i, x, rr, p, rz, rz0 = carry
                return (i < cg_max) & (rz > 1e-10 * rz0)

            def cg_body(carry):
                i, x, rr, p, rz, rz0 = carry
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = jnp.einsum("kij,kj->ki", Minv, rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                p = z + beta * p
                return i + 1, x, rr, p, rz_new, rz0

            x0 = jnp.zeros((K, D), S.dtype)
            r0 = b - matvec(x0)
            z0 = jnp.einsum("kij,kj->ki", Minv, r0)
            rz0 = jnp.sum(r0 * z0)
            _, x, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body, (0, x0, r0, z0, rz0, rz0)
            )
            dx = -x

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
