"""7-DoF Sim3 pose-graph (essential graph) optimization.

Re-design of †src/Optimizer.cc:OptimizeEssentialGraph (SURVEY §2.6): after a
loop closure, every keyframe pose becomes a Sim3 vertex (scale fixed to 1
for stereo/RGB-D), connected by relative-Sim3 edges from the essential graph
(spanning tree + loop edges + strong covisibility >= 100) with identity
information; 20 LM iterations; translation divided by scale at write-back.

g2o solves this in double precision; TPUs are f32 machines, so the solver is
restructured around three ideas that keep a KITTI-scale problem (2000+
keyframes, km-scale translations) inside f32's budget:

1. **Correction variables, not absolute poses.** Residuals
   e = log(S_ij S_j S_i^-1) on absolute f32 poses hit a roundoff floor of
   |t|*eps per edge (~1e-4 at km scale) because the S_j S_i^-1 cancellation
   happens between large stored values; that floor hides exactly the
   low-frequency error modes a loop closure must remove. Instead the initial
   poses are frozen as a base S0 and the solver optimizes small left
   corrections x_k (S_k = exp(x_k) S0_k), with the base-relative transforms
   M_ij = S0_j S0_i^-1 folded once per call. Every composition inside the
   residual is then between small/near-identity transforms; the one-time f32
   noise in M_ij acts as a fixed (harmless) measurement bias instead of a
   per-iteration noise floor.
2. **Gauge recentering.** The world is recentred at the camera-centre
   centroid and its spread normalized (S0 <- S0 * W; edge measurements are
   exactly invariant) so that world-side corrections — in particular the
   global-scale mode — stay O(1) in the camera frames.
3. **Loop-aware ramp initialization.** LM from raw drifted odometry crawls
   through a curved, nearly-flat valley (the drift-stretch mode has Hessian
   eigenvalue ~1/K^2). The residual of the strongest long-range edge (the
   loop edge) is distributed along the temporal chain as a one-parameter
   subgroup ramp before LM — which cancels accumulated drift in closed form
   and starts LM next to the optimum. Guarded: kept only if it lowers cost.

Per-edge (7, 14) Jacobians come from forward-mode autodiff (no hand-derived
Sim3 adjoints to get wrong), then one of two solvers chosen by problem size:

- K <= DENSE_MAX_K: dense normal equations, one solve of the (7K, 7K)
  system per LM iteration — the TPU-friendly regime for loop-sized graphs;
- larger K (KITTI scale): matrix-free conjugate gradients with a
  spanning-chain preconditioner — the Hessian is never materialized; each CG
  matvec is per-edge 7x7 block products + two segment-sums, and the
  preconditioner inverts the temporal-chain Hessian exactly via two affine
  associative scans (log-depth batched 7x7 matmuls). Memory stays O(E), the
  solve stays on the VPU/MXU, and f32 converges in tens of iterations
  because only the off-chain edges (loop + strong covis) are left to CG.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import precision


def _edge_residual(d_i, d_j, x_i, x_j, M_ij, S_ij):
    """e = log( S_ij * exp(d_j) exp(x_j) * M_ij * exp(-x_i) exp(-d_i) )

    with M_ij = S0_j * S0_i^-1 precomputed: the residual of edge (i, j) at
    corrections x (+ perturbations d, for linearization) without ever
    composing large absolute poses. All operands are small or near-identity.
    """
    A = geo.sim3_compose(S_ij, geo.sim3_exp(d_j))
    A = geo.sim3_compose(A, geo.sim3_exp(x_j))
    A = geo.sim3_compose(A, M_ij)
    A = geo.sim3_compose(A, geo.sim3_exp(-x_i))
    A = geo.sim3_compose(A, geo.sim3_exp(-d_i))
    return geo.sim3_log(A)


def _edge_lin(x_i, x_j, M_ij, S_ij):
    """Residual at d=0 and Jacobians wrt (d_i, d_j): (7,), (7,7), (7,7)."""
    z = jnp.zeros(7, M_ij.dtype)
    r = _edge_residual(z, z, x_i, x_j, M_ij, S_ij)
    Ji = jax.jacfwd(_edge_residual, argnums=0)(z, z, x_i, x_j, M_ij, S_ij)
    Jj = jax.jacfwd(_edge_residual, argnums=1)(z, z, x_i, x_j, M_ij, S_ij)
    return r, Ji, Jj


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray  # (K, 8) optimized Sim3 vectors
    cost: jnp.ndarray


DENSE_MAX_K = 384   # beyond this the dense (7K)^2 Cholesky loses to CG


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "solver"))
@precision.f32_matmuls
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
    order: jnp.ndarray | None = None,  # (K,) temporal vertex order for the
    # CG chain preconditioner (kf_seq-sorted, dead slots last); defaults to
    # slot order, which is correct until slot recycling reorders creation
) -> PoseGraphResult:
    return pose_graph_impl(
        S_init, fixed, valid, edge_i, edge_j, edge_Sij, edge_valid,
        iters=iters, fix_scale=fix_scale, solver=solver, order=order,
        axis_name=None,
    )


def pose_graph_impl(
    S_init, fixed, valid, edge_i, edge_j, edge_Sij, edge_valid,
    iters=20, fix_scale=False, solver="auto", order=None,
    axis_name: str | None = None,
) -> PoseGraphResult:
    """Unjitted body; `axis_name` enables the edge-sharded (shard_map) path.

    Sharded mode (SURVEY §5.7: "pose-graph optimization shards edges the
    same way"): each device holds an edge shard (pad E to a multiple of the
    mesh size with edge_valid=False rows). The heavy per-edge work — the
    autodiff linearization (jacfwd ~ 14 residual evaluations per edge) and
    the CG matvec block products — runs on the local shard; vertex-space
    reductions (gradient scatter, CG matvec output) are psum-reduced, a
    (K, 7) all-reduce each. Vertex-level structure (gauge recentering, the
    chain preconditioner scans) is replicated, and the full edge set is
    all-gathered once at entry for the cheap global pieces (chain
    re-integration lookup, loop-ramp init, total cost) — O(E * 18) floats.
    Only the CG solver is supported under sharding.
    """
    K = S_init.shape[0]
    D = 7
    if order is None:
        order = jnp.arange(K)
    ew = edge_valid.astype(S_init.dtype)
    freeze = fixed | ~valid
    if axis_name is not None:
        use_dense = False

        def _gather(a):
            g = jax.lax.all_gather(a, axis_name, axis=0)
            return g.reshape(-1, *a.shape[1:])

        edge_i_f = _gather(edge_i)
        edge_j_f = _gather(edge_j)
        edge_Sij_f = _gather(edge_Sij)
        ew_f = _gather(ew)
    else:
        use_dense = (K <= DENSE_MAX_K) if solver == "auto" \
            else (solver == "dense")
        edge_i_f, edge_j_f, edge_Sij_f, ew_f = edge_i, edge_j, edge_Sij, ew

    # ---- gauge recentering (idea 2) -----------------------------------
    centers = jax.vmap(
        lambda S: -geo.sim3_R(S).T @ geo.sim3_t(S) / geo.sim3_s(S)
    )(S_init)
    vw = valid.astype(S_init.dtype)[:, None]
    c0 = jnp.sum(centers * vw, axis=0) / jnp.maximum(jnp.sum(vw), 1.0)
    L = jnp.sqrt(
        jnp.sum(jnp.sum((centers - c0) ** 2, axis=1) * vw[:, 0])
        / jnp.maximum(jnp.sum(vw), 1.0)
    )
    L = jnp.maximum(L, 1.0)
    I3 = jnp.eye(3, dtype=S_init.dtype)
    W = geo.sim3_make(L, I3, c0)                      # x -> L x + c0
    W_inv = geo.sim3_inverse(W)
    S0 = jax.vmap(lambda S: geo.sim3_compose(S, W))(S_init)

    # ---- base-relative edge transforms (idea 1) -----------------------
    M_e = jax.vmap(
        lambda j, i: geo.sim3_compose(S0[j], geo.sim3_inverse(S0[i]))
    )(edge_j, edge_i)
    if axis_name is not None:
        M_e_f = jax.vmap(
            lambda j, i: geo.sim3_compose(S0[j], geo.sim3_inverse(S0[i]))
        )(edge_j_f, edge_i_f)
    else:
        M_e_f = M_e

    def edge_residuals(x):
        """Residuals over the FULL edge set (replicated in sharded mode)."""
        z = jnp.zeros(D, S0.dtype)
        return jax.vmap(
            lambda i, j, M, Sij: _edge_residual(z, z, x[i], x[j], M, Sij)
        )(edge_i_f, edge_j_f, M_e_f, edge_Sij_f)

    def total_cost(x):
        r = edge_residuals(x)
        return jnp.sum(jnp.sum(r * r, axis=1) * ew_f)

    # chain preconditioner base relatives (order-permuted, x-independent)
    ord_ = order
    inv_ord = jnp.argsort(ord_)
    S0p = S0[ord_]
    S0prev = jnp.roll(S0p, 1, axis=0)
    M_ch = jax.vmap(
        lambda a, c: geo.sim3_compose(a, geo.sim3_inverse(c))
    )(S0p, S0prev)          # S0p_k * S0p_{k-1}^-1
    M_ch_rev = jax.vmap(geo.sim3_inverse)(M_ch)  # = M of pseudo-edge (i=k, j=prev)
    anchor = (freeze[ord_]) | (jnp.arange(K) == 0)

    # ---- closed-form initialization (idea 3) --------------------------
    # (a) Chain re-integration: re-compose the MEASURED chain-edge
    # relatives along the temporal backbone (prefix Sim3 products via one
    # log-depth associative scan). This zeroes every chain residual in
    # closed form — the open-loop odometry re-integration — so LM never
    # has to move the near-null drift-stretch modes through their flat,
    # curved valley (where f32 gradient noise makes it wander).
    pos = jnp.argsort(order)  # chain position of each vertex slot
    x_zero = jnp.zeros((K, D), S0.dtype)
    E = edge_i_f.shape[0]
    keys = jnp.where(
        ew_f > 0, edge_i_f * K + edge_j_f, jnp.int32(2**30)
    )
    perm = jnp.argsort(keys)
    keys_sorted = keys[perm]

    def _lookup(qk):
        p = jnp.clip(jnp.searchsorted(keys_sorted, qk), 0, E - 1)
        return jnp.where(keys_sorted[p] == qk, perm[p], -1)

    a_ids = ord_
    b_ids = jnp.roll(ord_, 1)
    fwd = _lookup(a_ids * K + b_ids)   # edge (i=a, j=b): Sab = S_a S_b^-1
    rev = _lookup(b_ids * K + a_ids)
    R_link = jnp.where(
        (fwd >= 0)[:, None],
        edge_Sij_f[jnp.maximum(fwd, 0)],
        jnp.where(
            (rev >= 0)[:, None],
            jax.vmap(geo.sim3_inverse)(edge_Sij_f[jnp.maximum(rev, 0)]),
            M_ch,  # unmeasured link: keep the current relative
        ),
    )
    R_link = R_link.at[0].set(geo.sim3_identity(S0.dtype))

    def _chain_prefix(R):
        # Q_k = R_k * R_{k-1} * ... * R_0  (later factors on the left)
        return jax.lax.associative_scan(
            jax.vmap(lambda a, b: geo.sim3_compose(b, a)), R
        )

    S_int_pos = jax.vmap(geo.sim3_compose)(
        _chain_prefix(R_link), jnp.broadcast_to(S0p[0], S0p.shape)
    )
    x_int = jax.vmap(
        lambda Sn, Sb: geo.sim3_log(geo.sim3_compose(Sn, geo.sim3_inverse(Sb)))
    )(S_int_pos, S0p)[inv_ord]
    x_int = jnp.where(freeze[:, None], 0.0, x_int)
    x_best = jnp.where(total_cost(x_int) < total_cost(x_zero), x_int, x_zero)

    # (b) Loop-aware ramp: distribute the residual of the strongest
    # long-range edge (residual norm x chain span — the loop edge) along
    # the chain as a one-parameter subgroup, cancelling what accumulated
    # drift the re-integration left (or all of it when the chain has no
    # measured edges). Both inits are guarded by the total cost.
    r0_edges = edge_residuals(x_best)
    span = jnp.abs(pos[edge_i_f] - pos[edge_j_f]).astype(S0.dtype)
    score = jnp.linalg.norm(r0_edges, axis=1) * span * ew_f
    eidx = jnp.argmax(score)
    li = edge_i_f[eidx]
    e_loop = r0_edges[eidx]
    if fix_scale:
        e_loop = e_loop.at[6].set(0.0)
    swap = pos[li] > pos[edge_j_f[eidx]]  # far end of the edge in chain order
    pa = jnp.minimum(pos[li], pos[edge_j_f[eidx]]).astype(S0.dtype)
    pb = jnp.maximum(pos[li], pos[edge_j_f[eidx]]).astype(S0.dtype)
    # full far-endpoint correction, world-side: G = S_i^-1 exp(-+e) S_i
    # with S_i the CURRENT pose exp(x_best_i) S0_i
    Si = geo.sim3_compose(geo.sim3_exp(x_best[li]), S0[li])
    Gfull = geo.sim3_compose(
        geo.sim3_inverse(Si),
        geo.sim3_compose(
            geo.sim3_exp(jnp.where(swap, e_loop, -e_loop)), Si
        ),
    )
    gvec = geo.sim3_log(Gfull)
    w = jnp.clip(
        (pos.astype(S0.dtype) - pa) / jnp.maximum(pb - pa, 1.0), 0.0, 1.0
    )
    w = jnp.where(freeze, 0.0, w)
    # ramp on top of x_best: exp(x') S0 = exp(x_best) S0 exp(w g)
    x_ramp = jax.vmap(
        lambda xb, S, wk: geo.sim3_log(
            geo.sim3_compose(
                geo.sim3_exp(xb),
                geo.sim3_compose(
                    S,
                    geo.sim3_compose(
                        geo.sim3_exp(wk * gvec), geo.sim3_inverse(S)
                    ),
                ),
            )
        )
    )(x_best, S0, w)
    x_init = jnp.where(total_cost(x_ramp) < total_cost(x_best), x_ramp, x_best)

    def step(x, lam):
        r, Ji, Jj = jax.vmap(
            lambda i, j, M, Sij: _edge_lin(x[i], x[j], M, Sij)
        )(edge_i, edge_j, M_e, edge_Sij)
        Jiw = Ji * ew[:, None, None]
        Jjw = Jj * ew[:, None, None]
        # per-edge normal-equation blocks
        Hii = jnp.einsum("eri,erj->eij", Jiw, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jjw, Jj)
        Hij = jnp.einsum("eri,erj->eij", Jiw, Jj)
        bi = jnp.einsum("eri,er->ei", Jiw, r)
        bj = jnp.einsum("eri,er->ei", Jjw, r)

        b = (
            jnp.zeros((K, D), S0.dtype).at[edge_i].add(bi).at[edge_j].add(bj)
        )
        if axis_name is not None:
            b = jax.lax.psum(b, axis_name)
        b = jnp.where(freeze[:, None], 0.0, b)
        diag = jnp.arange(K)

        if use_dense:
            H = jnp.zeros((K, K, D, D), S0.dtype)
            H = H.at[edge_i, edge_i].add(Hii)
            H = H.at[edge_j, edge_j].add(Hjj)
            H = H.at[edge_i, edge_j].add(Hij)
            H = H.at[edge_j, edge_i].add(Hij.transpose(0, 2, 1))
            # fixed / dead vertices -> identity rows
            H = jnp.where(freeze[:, None, None, None], 0.0, H)
            H = jnp.where(freeze[None, :, None, None], 0.0, H)
            H = H.at[diag, diag].add(
                jnp.where(freeze, 1.0, 0.0)[:, None, None]
                * jnp.eye(D, dtype=S0.dtype)
            )
            H = H.at[diag, diag].add(lam * jnp.eye(D, dtype=S0.dtype)[None])
            Hm = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
            dx = -jnp.linalg.solve(Hm, b.reshape(-1)).reshape(K, D)
        else:
            # ---- matrix-free PCG, spanning-chain preconditioner ----
            # Plain (block-Jacobi) CG moves information ONE graph hop per
            # iteration, so a 2000-KF odometry chain needs ~2000 iterations
            # for a loop correction to reach the far end — past where f32
            # recurrences lose orthogonality and stall. Instead precondition
            # with the EXACT inverse of the chain Hessian: pseudo-edges
            # between temporally consecutive vertices (`order` — the
            # odometry backbone that dominates an ORB-SLAM essential graph).
            # The chain factor A is block-bidiagonal, so A^-1 v is an affine
            # recurrence x_k = M_k x_{k-1} + c_k — evaluated in log-depth
            # with jax.lax.associative_scan (TPU-friendly: batched 7x7
            # matmuls, no sequential solve). CG then only resolves the few
            # off-chain edges (loop + strong covis): tens of iterations,
            # well inside f32's budget.
            xp = x[ord_]
            xprev = jnp.roll(xp, 1, axis=0)
            # pseudo-edge (i=k, j=prev) with measurement = current inverse
            # relative, built from small pieces only
            Spe = jax.vmap(
                lambda xk, Mc, xpv: geo.sim3_compose(
                    geo.sim3_exp(xk),
                    geo.sim3_compose(Mc, geo.sim3_exp(-xpv)),
                )
            )(xp, M_ch, xprev)
            _, Ach, Bch = jax.vmap(
                lambda xk, xpv, Mr, Sij: _edge_lin(xk, xpv, Mr, Sij)
            )(xp, xprev, M_ch_rev, Spe)
            I7 = jnp.eye(D, dtype=S0.dtype)
            # anchored rows (fixed/dead vertices + chain head): identity row,
            # and never propagate through an anchored predecessor
            Ach = jnp.where(anchor[:, None, None], I7[None], Ach)
            Bch = jnp.where(anchor[:, None, None], 0.0, Bch)
            Bch = jnp.where(jnp.roll(anchor, 1)[:, None, None], 0.0, Bch)
            Ainv = jnp.linalg.inv(Ach)
            AinvT = Ainv.transpose(0, 2, 1)
            Bnext = jnp.roll(Bch, -1, axis=0).at[-1].set(0.0)
            M_fwd = -jnp.einsum("kij,kjl->kil", Ainv, Bch)
            M_bwd = -jnp.einsum("kij,klj->kil", AinvT, Bnext)

            def _affine_scan(M, c):
                # x_k = M_k x_{k-1} + c_k with x_{-1} = 0, all k at once
                def comb(a_, b_):
                    Ma, ca = a_
                    Mb, cb = b_
                    return Mb @ Ma, jnp.einsum("...ij,...j->...i", Mb, ca) + cb

                _, xs = jax.lax.associative_scan(comb, (M, c))
                return xs

            def precond(r_):
                rp = r_[ord_]
                # solve A^T y = rp: backward recurrence (flip + scan + flip)
                cb = jnp.einsum("kij,kj->ki", AinvT, rp)
                y = _affine_scan(M_bwd[::-1], cb[::-1])[::-1]
                # solve A x = y: forward recurrence
                cf = jnp.einsum("kij,kj->ki", Ainv, y)
                xs = _affine_scan(M_fwd, cf)
                z_ = xs[inv_ord]
                return jnp.where(freeze[:, None], r_, z_)

            def matvec(v):
                vi = v[edge_i]
                vj = v[edge_j]
                yi = jnp.einsum("eij,ej->ei", Hii, vi) + jnp.einsum(
                    "eij,ej->ei", Hij, vj
                )
                yj = jnp.einsum("eji,ej->ei", Hij, vi) + jnp.einsum(
                    "eij,ej->ei", Hjj, vj
                )
                # frozen columns contribute nothing automatically: v stays
                # exactly 0 on frozen rows (b=0 there, matvec is identity
                # there, the preconditioner is identity there)
                y = (
                    jnp.zeros((K, D), S0.dtype)
                    .at[edge_i].add(yi)
                    .at[edge_j].add(yj)
                )
                if axis_name is not None:
                    y = jax.lax.psum(y, axis_name)
                y = y + lam * v
                return jnp.where(freeze[:, None], v, y)

            # frozen rows stay exactly 0 throughout (b rows are 0 and
            # matvec maps them to themselves). The chain preconditioner
            # spans the whole backbone in one application, so the budget
            # only has to cover the off-chain coupling; the while_loop
            # exits early once the preconditioned residual collapses.
            cg_max = min(K, 600)

            def cg_cond(carry):
                i, v, rr, p, rz, rz0 = carry
                return (i < cg_max) & (rz > 1e-10 * rz0)

            def cg_body(carry):
                i, v, rr, p, rz, rz0 = carry
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                v = v + alpha * p
                rr = rr - alpha * Ap
                z = precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                p = z + beta * p
                return i + 1, v, rr, p, rz_new, rz0

            v0 = jnp.zeros((K, D), S0.dtype)
            r0 = b - matvec(v0)
            z0 = precond(r0)
            rz0 = jnp.sum(r0 * z0)
            _, v, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body, (0, v0, r0, z0, rz0, rz0)
            )
            dx = -v

        if fix_scale:
            dx = dx.at[:, 6].set(0.0)  # †bFixScale: no scale drift for stereo
        dx = jnp.where(freeze[:, None], 0.0, dx)
        # fold the step into the accumulated correction (small x small)
        x_new = jax.vmap(
            lambda d, xx: geo.sim3_log(
                geo.sim3_compose(geo.sim3_exp(d), geo.sim3_exp(xx))
            )
        )(dx, x)
        return x_new

    def body(_, carry):
        x, lam, cost = carry
        x_new = step(x, lam)
        cost_new = total_cost(x_new)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        # Aggressive decay on accept, tiny floor: the drift-stretch mode of
        # a K-vertex odometry chain has Hessian eigenvalue ~1/K^2 (2.5e-7
        # at K=2000) — any lam above that freezes exactly the mode a loop
        # correction must move, so near convergence lam must drop below it.
        lam = jnp.where(accept, jnp.maximum(lam * 0.2, 1e-12), lam * 4.0)
        cost = jnp.where(accept, cost_new, cost)
        return x, lam, cost

    cost0 = total_cost(x_init)
    x, _, cost = jax.lax.fori_loop(0, iters, body, (x_init, 1e-8, cost0))
    # materialize absolute poses: exp(x) * S0 * W^-1 (one big composition;
    # its f32 roundoff lands in the OUTPUT, ~|t|*eps, irrelevant vs cm ATE)
    S = jax.vmap(
        lambda xx, Sb: geo.sim3_compose(
            geo.sim3_compose(geo.sim3_exp(xx), Sb), W_inv
        )
    )(x, S0)
    return PoseGraphResult(poses=S, cost=cost)
