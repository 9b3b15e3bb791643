"""Motion-only bundle adjustment: batched Levenberg-Marquardt on one SE3 pose.

Replaces †src/Optimizer.cc:PoseOptimization (SURVEY §2.6): one pose vertex,
unary reprojection edges (mono 2-DoF / stereo 3-DoF), Huber robust kernel
(delta = sqrt(5.991) mono / sqrt(7.815) stereo), 4 rounds x 10 LM iterations
with chi^2 outlier re-classification between rounds; outliers are excluded
from rounds >= 3 and the robust kernel is dropped for the last rounds —
matching the reference schedule.

The g2o graph disappears: residuals/Jacobians for all N edges are computed in
one batch, the 6x6 normal equations are an einsum, and the LM loop is a
`lax.fori_loop` — the whole thing is one fused XLA program per call.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import linalg_small
from ..models.camera import Camera

CHI2_MONO = 5.991    # 2-DoF 95% (†Optimizer.cc)
CHI2_STEREO = 7.815  # 3-DoF 95%


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray      # (4, 4) optimized pose
    inliers: jnp.ndarray  # (N,) bool final inlier classification
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray     # (N,) final per-edge chi^2


def _residuals_jacobians(
    Tcw: jnp.ndarray,
    cam: Camera,
    pts_w: jnp.ndarray,
    obs: jnp.ndarray,
    is_stereo: jnp.ndarray,
):
    """Residuals r (N, 3) and Jacobians J (N, 3, 6) wrt a LEFT twist update
    T <- exp(xi) T, with the third (u_right) row zeroed for mono edges."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t                     # (N, 3) camera-frame points
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    r = jnp.stack(
        [u - obs[:, 0], v - obs[:, 1], jnp.where(is_stereo, ur - obs[:, 2], 0.0)],
        axis=1,
    )

    # d(pixel)/d(pc)
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=1)
    Jv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=1)
    Jur = jnp.stack(
        [cam.fx * inv_z, zero, -cam.fx * x * inv_z2 + cam.bf * inv_z2], axis=1
    )
    Jpix = jnp.stack([Ju, Jv, jnp.where(is_stereo[:, None], Jur, 0.0)], axis=1)

    # d(pc)/d(xi) for left perturbation: [ I | -[pc]x ]
    N = pc.shape[0]
    Jpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (N, 3, 3)), -geo.hat(pc)],
        axis=2,
    )  # (N, 3, 6)
    J = jnp.einsum("nrk,nkc->nrc", Jpix, Jpc)  # (N, 3, 6)
    return r, J, z


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def optimize_pose(
    Tcw_init: jnp.ndarray,
    cam: Camera,
    pts_w: jnp.ndarray,
    obs: jnp.ndarray,
    sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    rounds: int = 4,
    iters: int = 10,
) -> PoseOptResult:
    """Optimize one camera pose against fixed world points.

    Args:
      Tcw_init: (4, 4) initial pose.
      pts_w:    (N, 3) matched map-point positions (fixed).
      obs:      (N, 3) observed (u, v, u_right); u_right < 0 marks mono edges.
      sigma2:   (N,) per-edge octave variance (scale_factor^(2*octave)).
      valid:    (N,) bool edge mask (padding / unmatched rows False).
    """
    is_stereo = obs[:, 2] >= 0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta2 = chi2_th  # Huber delta^2 in chi^2 units (sqrt(5.991)/sqrt(7.815))
    inv_sigma2 = 1.0 / jnp.maximum(sigma2, 1e-12)

    def edge_chi2(Tcw):
        r, _, z = _residuals_jacobians(Tcw, cam, pts_w, obs, is_stereo)
        chi2 = jnp.sum(r * r, axis=1) * inv_sigma2
        behind = z <= 1e-5
        return jnp.where(behind, 1e9, chi2)

    def rho(chi2, use_huber):
        """Huber-robustified cost of a chi^2 value (g2o's rho)."""
        c = jnp.minimum(chi2, 1e9)
        hub = jnp.where(
            c <= delta2, c, 2.0 * jnp.sqrt(delta2 * jnp.maximum(c, 1e-12)) - delta2
        )
        return jnp.where(use_huber, hub, jnp.minimum(c, 1e6))

    def lm_block(Tcw, edge_mask, use_huber, n_iters):
        """n_iters LM iterations with a fixed edge set."""

        def body(_, carry):
            Tcw, lam, prev_cost = carry
            r, J, _ = _residuals_jacobians(Tcw, cam, pts_w, obs, is_stereo)
            chi2 = jnp.sum(r * r, axis=1) * inv_sigma2
            # Robust (Huber) weight in information units.
            w_huber = jnp.where(
                chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
            )
            w = jnp.where(use_huber, w_huber, 1.0) * inv_sigma2
            w = jnp.where(edge_mask, w, 0.0)
            Jw = J * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", Jw, J)
            b = jnp.einsum("nri,nr->i", Jw, r)
            # Levenberg damping on the diagonal.
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
            dx = -linalg_small.solve_spd_small(Hd, b)
            T_new = geo.se3_exp(dx) @ Tcw
            # Robustified cost so accept/reject matches the robust gradient.
            r2, _, _ = _residuals_jacobians(T_new, cam, pts_w, obs, is_stereo)
            chi2_new = jnp.sum(r2 * r2, axis=1) * inv_sigma2
            cost_new = jnp.sum(jnp.where(edge_mask, rho(chi2_new, use_huber), 0.0))
            accept = cost_new < prev_cost
            Tcw = jnp.where(accept, T_new, Tcw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, cost_new, prev_cost)
            return Tcw, lam, cost

        chi0 = edge_chi2(Tcw)
        cost0 = jnp.sum(jnp.where(edge_mask, rho(chi0, use_huber), 0.0))
        Tcw, _, _ = jax.lax.fori_loop(0, n_iters, body, (Tcw, 1e-3, cost0))
        return Tcw

    Tcw = Tcw_init
    inliers = valid
    for rnd in range(rounds):
        use_huber = rnd < 2  # reference drops the robust kernel late
        edge_mask = valid if rnd < 2 else inliers  # exclude outliers late
        Tcw = lm_block(Tcw, edge_mask, use_huber, iters)
        chi2 = edge_chi2(Tcw)
        inliers = valid & (chi2 <= chi2_th)

    chi2 = edge_chi2(Tcw)
    inliers = valid & (chi2 <= chi2_th)
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
        chi2=chi2,
    )
