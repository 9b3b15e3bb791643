"""Bundle adjustment: batched Levenberg-Marquardt with landmark Schur complement.

Replaces g2o's BlockSolver_6_3 + LinearSolverEigen pipeline
(†src/Optimizer.cc:LocalBundleAdjustment / BundleAdjustment, SURVEY §2.6):
instead of a sparse hyper-graph, the problem arrives as fixed-capacity
arrays — a per-point observation table — and one LM iteration is a handful of
einsums + segment reductions + one dense Cholesky of the reduced camera
system:

    D_m   = sum_o  Jl^T W Jl          (3x3 per landmark, batched inverse)
    H_cc  = sum_e  Jp^T W Jp          (6x6 per camera, segment-sum)
    E_mo  = Jp^T W Jl                 (6x3 per observation)
    S     = H_cc - sum_m E D^-1 E^T   (dense (6K, 6K) reduced system)
    S dc  = -(b_c - E D^-1 b_l)       (Cholesky; K <= a few hundred)
    dl_m  = -D^-1 (b_l + E^T dc)      (back-substitution, batched)

Dense S is deliberate: SLAM maps have K in the tens-to-hundreds per window,
so (6K)^2 easily fits VMEM/HBM and the Cholesky runs on the MXU — the
sparse-vs-dense trade SURVEY §7.1 calls out. The multi-chip variant shards
the landmark axis and psum-reduces S (parallel/sharded_ba.py).

Observation layout (static shapes, host-gathered window):
  obs_kf:    (M, O) int32   camera index per observation (-1 = none)
  obs_uvr:   (M, O, 3)      measured (u, v, u_right); u_right < 0 => mono
  obs_sigma2:(M, O)         octave variance
  obs_valid: (M, O) bool
Cameras: poses (K, 4, 4) Tcw with opt_mask (K,) (False = fixed/boundary KF).
Landmarks: points (M, 3) with point_valid (M,).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import linalg_small
from . import precision
from ..models.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    poses: jnp.ndarray       # (K, 4, 4)
    opt_mask: jnp.ndarray    # (K,) bool — optimize this camera
    points: jnp.ndarray      # (M, 3)
    point_valid: jnp.ndarray  # (M,)
    obs_kf: jnp.ndarray      # (M, O) int32
    obs_uvr: jnp.ndarray     # (M, O, 3)
    obs_sigma2: jnp.ndarray  # (M, O)
    obs_valid: jnp.ndarray   # (M, O) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (M, O) bool final chi2 classification
    cost: jnp.ndarray        # () final robust cost


def _project_residuals(cam: Camera, poses, points, prob: BAProblem):
    """Residuals r (M, O, 3), Jacobians Jp (M, O, 3, 6), Jl (M, O, 3, 3),
    and depth z (M, O) for every observation."""
    kf = jnp.maximum(prob.obs_kf, 0)
    T = poses[kf]                       # (M, O, 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    pc = jnp.einsum("moij,mj->moi", R, points) + t   # (M, O, 3)
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    is_stereo = prob.obs_uvr[..., 2] >= 0

    r = jnp.stack(
        [
            u - prob.obs_uvr[..., 0],
            v - prob.obs_uvr[..., 1],
            jnp.where(is_stereo, ur - prob.obs_uvr[..., 2], 0.0),
        ],
        axis=-1,
    )

    zero = jnp.zeros_like(x)
    Ju = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    Jv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    Jur = jnp.stack(
        [cam.fx * inv_z, zero, -cam.fx * x * inv_z2 + cam.bf * inv_z2], axis=-1
    )
    Jpix = jnp.stack(
        [Ju, Jv, jnp.where(is_stereo[..., None], Jur, 0.0)], axis=-2
    )  # (M, O, 3, 3) d(pixel)/d(pc)

    # d(pc)/d(xi), left twist on Tcw: [I | -[pc]x]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    Jpc_pose = jnp.concatenate([eye, -geo.hat(pc)], axis=-1)  # (M, O, 3, 6)
    Jp = Jpix @ Jpc_pose                                       # (M, O, 3, 6)
    # d(pc)/d(point) = R
    Jl = Jpix @ R                                              # (M, O, 3, 3)
    return r, Jp, Jl, z, is_stereo


def _robust_weights(r, sigma2, is_stereo, valid, z, use_huber):
    chi2 = jnp.sum(r * r, axis=-1) / jnp.maximum(sigma2, 1e-12)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    w_huber = jnp.where(
        chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
    )
    w = jnp.where(use_huber, w_huber, 1.0) / jnp.maximum(sigma2, 1e-12)
    w = jnp.where(valid & (z > 1e-5), w, 0.0)
    rho = jnp.where(
        chi2 <= delta2,
        chi2,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
    )
    cost = jnp.sum(jnp.where(valid, jnp.where(use_huber, rho, jnp.minimum(chi2, 1e6)), 0.0))
    return w, chi2, cost


def _build_and_solve(cam, poses, points, prob, valid_obs, use_huber, lam,
                     axis_name=None):
    """One normal-equation build + Schur solve. Returns (dc (K,6), dl (M,3)).

    With `axis_name` set (inside shard_map over the landmark axis), the
    reduced system S and RHS are psum-reduced across the mesh before the
    (replicated) solve — the multi-chip Schur reduction of SURVEY §5.7.
    """
    K = poses.shape[0]
    r, Jp, Jl, z, is_stereo = _project_residuals(cam, poses, points, prob)
    w, _, _ = _robust_weights(r, prob.obs_sigma2, is_stereo, valid_obs, z, use_huber)

    Jp_w = Jp * w[..., None, None]
    # Per-landmark 3x3 and per-camera 6x6 blocks.
    D = jnp.einsum("mori,morj->mij", Jl * w[..., None, None], Jl)  # (M, 3, 3)
    b_l = jnp.einsum("mori,mor->mi", Jl * w[..., None, None], r)   # (M, 3)
    E_blk = jnp.einsum("mori,morj->moij", Jp_w, Jl)                # (M, O, 6, 3)

    # Camera-indexed reductions as one-hot matmuls: scatters serialize on
    # TPU, the MXU does not. onehot is (M, O, K) with zero rows for invalid.
    onehot = (
        jnp.maximum(prob.obs_kf, 0)[..., None]
        == jnp.arange(K, dtype=prob.obs_kf.dtype)[None, None, :]
    ).astype(poses.dtype) * (prob.obs_kf >= 0)[..., None].astype(poses.dtype)
    Hcc_e = jnp.einsum("mori,morj->moij", Jp_w, Jp)                # (M, O, 6, 6)
    bc_e = jnp.einsum("mori,mor->moi", Jp_w, r)                    # (M, O, 6)
    H_cc = jnp.einsum("mok,moij->kij", onehot, Hcc_e)              # (K, 6, 6)
    b_c = jnp.einsum("mok,moi->ki", onehot, bc_e)                  # (K, 6)

    # Damped landmark-block inverses.
    lamI = 1e-9 + lam
    D_damped = D + lamI * jnp.eye(3, dtype=D.dtype) * jnp.maximum(
        jnp.trace(D, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-6
    )
    D_inv = linalg_small.inv3x3(D_damped + 1e-8 * jnp.eye(3, dtype=D.dtype))
    D_inv = jnp.where(prob.point_valid[:, None, None], D_inv, 0.0)

    # Schur complement S (dense) and reduced RHS, via the same one-hot trick:
    # S -= sum_m (sum_o1 onehot*ED)[m,k,i,c] . (sum_o2 onehot*E)[m,l,j,c]
    ED = jnp.einsum("moij,mjk->moik", E_blk, D_inv)                # (M, O, 6, 3)
    P_blk = jnp.einsum("mok,moic->mkic", onehot, ED)               # (M, K, 6, 3)
    Q_blk = jnp.einsum("mok,mojc->mkjc", onehot, E_blk)            # (M, K, 6, 3)
    S = -jnp.einsum("mkic,mljc->klij", P_blk, Q_blk)               # (K, K, 6, 6)
    diag = jnp.arange(K)
    S = S.at[diag, diag].add(H_cc)

    b_S = b_c - jnp.einsum(
        "mok,moij,mj->ki", onehot, ED, b_l
    )

    if axis_name is not None:
        # Landmark axis is sharded: the reduced camera system is the sum of
        # per-shard contributions (rides ICI as one all-reduce).
        S = jax.lax.psum(S, axis_name)
        b_S = jax.lax.psum(b_S, axis_name)

    # Fix non-optimized cameras: identity rows/cols, zero RHS.
    fixed = ~prob.opt_mask
    S = jnp.where(fixed[:, None, None, None], 0.0, S)
    S = jnp.where(fixed[None, :, None, None], 0.0, S)
    S = S.at[diag, diag].add(
        jnp.where(fixed, 1.0, 0.0)[:, None, None] * jnp.eye(6, dtype=S.dtype)
    )
    b_S = jnp.where(fixed[:, None], 0.0, b_S)

    # LM damping on the camera diagonal + solve.
    Sd = S.at[diag, diag].add(
        lam * jnp.eye(6, dtype=S.dtype)[None]
        * jnp.maximum(
            jnp.trace(S[diag, diag], axis1=-2, axis2=-1)[:, None, None] / 6.0, 1e-6
        )
    )
    S_mat = Sd.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dc = -jnp.linalg.solve(S_mat, b_S.reshape(-1)).reshape(K, 6)
    dc = jnp.where(prob.opt_mask[:, None], dc, 0.0)

    # Back-substitute landmarks: dl = -D^-1 (b_l + sum_o E^T dc_k)
    dc_per_obs = jnp.einsum("mok,ki->moi", onehot, dc)             # (M, O, 6)
    Et_dc = jnp.einsum("moij,moi->mj", E_blk, dc_per_obs)          # (M, 3)
    dl = -jnp.einsum("mij,mj->mi", D_inv, b_l + Et_dc)
    dl = jnp.where(prob.point_valid[:, None], dl, 0.0)
    return dc, dl


def _apply(poses, points, dc, dl):
    return jax.vmap(lambda T, xi: geo.se3_exp(xi) @ T)(poses, dc), points + dl


@functools.partial(
    jax.jit, static_argnames=("iters", "outlier_rounds", "fix_points")
)
@precision.f32_matmuls
def optimize_ba(
    cam: Camera,
    prob: BAProblem,
    iters: int = 15,
    outlier_rounds: int = 1,
    fix_points: bool = False,
) -> BAResult:
    """Run the reference's local/global BA schedule (single device).

    iters LM iterations with Huber; then chi2 outlier classification and
    `outlier_rounds` x (iters//2) more iterations without outliers/robust
    kernel (matches the 5+10 / drop-outliers schedule of
    †LocalBundleAdjustment).
    """
    return optimize_ba_impl(cam, prob, iters, outlier_rounds, fix_points, None)


def optimize_ba_impl(
    cam: Camera,
    prob: BAProblem,
    iters: int = 15,
    outlier_rounds: int = 1,
    fix_points: bool = False,
    axis_name: str | None = None,
) -> BAResult:
    """Unjitted BA body; `axis_name` enables the sharded (shard_map) path
    where the landmark axis is split across devices and the reduced camera
    system is psum-reduced (see parallel/sharded_ba.py)."""
    valid0 = prob.obs_valid & (prob.obs_kf >= 0) & prob.point_valid[:, None]

    def cost_of(poses, points, valid_obs, use_huber):
        r, _, _, z, is_st = _project_residuals(cam, poses, points, prob)
        _, chi2, cost = _robust_weights(
            r, prob.obs_sigma2, is_st, valid_obs, z, use_huber
        )
        if axis_name is not None:
            cost = jax.lax.psum(cost, axis_name)
        return cost, chi2

    def lm_phase(poses, points, valid_obs, use_huber, n, matmul_precision):
        def body(_, carry):
            poses, points, lam, prev_cost = carry
            with jax.default_matmul_precision(matmul_precision):
                dc, dl = _build_and_solve(
                    cam, poses, points, prob, valid_obs, use_huber, lam,
                    axis_name=axis_name,
                )
                if fix_points:
                    dl = jnp.zeros_like(dl)
                poses_n, points_n = _apply(poses, points, dc, dl)
                cost_n, _ = cost_of(poses_n, points_n, valid_obs, use_huber)
            accept = cost_n < prev_cost
            poses = jnp.where(accept, poses_n, poses)
            points = jnp.where(accept, points_n, points)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, cost_n, prev_cost)
            return poses, points, lam, cost

        cost0, _ = cost_of(poses, points, valid_obs, use_huber)
        poses, points, _, cost = jax.lax.fori_loop(
            0, n, body, (poses, points, 1e-4, cost0)
        )
        return poses, points, cost

    def lm_mixed(poses, points, valid_obs, use_huber, n):
        """Mixed-precision LM: bulk iterations with fast single-pass bf16
        matmuls, then TAIL_F32 polishing iterations at true float32.

        bf16 rounding leaves LM ~3% above the f32 optimum (measured on the
        64-camera bench window: same trajectory, final cost 13610 vs 13230)
        but runs 1.65x faster per iteration; re-linearizing the last few
        iterations at f32 recovers the full-precision optimum because LM is
        self-correcting — each step is computed from a fresh f32 residual.
        """
        TAIL_F32 = 3
        n_bulk = max(n - TAIL_F32, 0)
        if n_bulk:
            poses, points, _ = lm_phase(
                poses, points, valid_obs, use_huber, n_bulk, "default"
            )
        return lm_phase(
            poses, points, valid_obs, use_huber, n - n_bulk, "float32"
        )

    poses, points = prob.poses, prob.points
    poses, points, cost = lm_mixed(poses, points, valid0, True, iters)

    valid_obs = valid0
    for _ in range(outlier_rounds):
        _, chi2 = cost_of(poses, points, valid_obs, False)
        th = jnp.where(prob.obs_uvr[..., 2] >= 0, CHI2_STEREO, CHI2_MONO)
        valid_obs = valid0 & (chi2 <= th)
        poses, points, cost = lm_mixed(
            poses, points, valid_obs, False, max(iters // 2, 1)
        )

    _, chi2 = cost_of(poses, points, valid_obs, False)
    th = jnp.where(prob.obs_uvr[..., 2] >= 0, CHI2_STEREO, CHI2_MONO)
    inlier = valid0 & (chi2 <= th)
    return BAResult(poses=poses, points=points, obs_inlier=inlier, cost=cost)
