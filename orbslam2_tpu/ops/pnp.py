"""Batched EPnP + RANSAC for relocalization.

Re-design of †src/PnPsolver.cc (SURVEY §2.7): the reference runs EPnP
(Lepetit et al.) inside an adaptive RANSAC, one hypothesis at a time, then
refines the winner on its full inlier set (†PnPsolver::Refine). Here all
hypotheses are evaluated as one vmapped batch (SURVEY §7.1); each hypothesis
follows the full reference pipeline:

  1. 4 control points: centroid + PCA axes (†choose_control_points)
  2. barycentric coordinates (†compute_barycentric_coordinates)
  3. 2S x 12 projection system M; null-space basis v1..v4 of M^T M (†fill_M)
  4. beta-case enumeration N=1/2/3 (†find_betas_approx_1/2/3) seeded from the
     6-pair inter-control-point distance system L beta = rho
  5. 5-iteration Gauss-Newton on the 4-vector beta (†gauss_newton)
  6. Horn absolute orientation control-point alignment (†compute_R_and_t),
     keeping the beta case with the lowest reprojection SSE (†compute_pose)

RANSAC deviation (documented): instead of the reference's sequential adaptive
iteration count, a fixed batch of hypotheses is scored at once — the batch is
sized at the reference's maxIterations=300 ceiling, so coverage is a superset
of what the adaptive loop would try, at one kernel launch. The winner is then
refined EPnP-on-all-inliers (†Refine) and the result handed to motion-only LM
(ops.pose_opt) exactly as relocalization does after †PnPsolver::iterate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import precision
from ..models.camera import Camera

SAMPLE_SIZE = 4          # †mRansacMinSet = 4
N_GN_ITERS = 5           # †gauss_newton iterations_number = 5
CHI2_PNP = 5.991

# 6 unordered control-point pairs (i < j) of the 4 control points.
_PAIR_I = jnp.array([0, 0, 0, 1, 1, 2], jnp.int32)
_PAIR_J = jnp.array([1, 2, 3, 2, 3, 3], jnp.int32)


def _control_points(pts_w: jnp.ndarray, w: jnp.ndarray):
    """Weighted control points: centroid + sqrt-eigenvalue-scaled PCA axes.

    pts_w (S, 3), w (S,) non-negative weights (RANSAC minimal sets pass all
    ones; Refine passes the inlier mask). Returns Cw (4, 3).
    """
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pts_w * w[:, None], axis=0) / sw
    centered = (pts_w - c0) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / sw
    evals, evecs = jnp.linalg.eigh(cov)
    axes = evecs * jnp.sqrt(jnp.maximum(evals, 1e-9))[None, :]
    return jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)


def _betas_from_L(L: jnp.ndarray, rho: jnp.ndarray):
    """Seed betas for the three reference approximation cases.

    L (6, 10) with columns ordered [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44]
    (the EPnP paper's order, matching †compute_L_6x10); rho (6,) squared
    world control-point pair distances. Returns (3, 4) beta seeds.
    """
    def lsq(cols):
        A = L[:, jnp.array(cols)]
        AtA = A.T @ A + 1e-9 * jnp.eye(len(cols), dtype=L.dtype)
        return jnp.linalg.solve(AtA, A.T @ rho)

    # Case 1 (†find_betas_approx_1): columns b11, b12, b13, b14.
    b = lsq([0, 1, 3, 6])
    beta1 = jnp.sqrt(jnp.abs(b[0]))
    s1 = jnp.where(b[0] < 0, -1.0, 1.0)
    div = jnp.where(beta1 > 1e-9, beta1, 1.0)
    betas_1 = jnp.array(
        [beta1, s1 * b[1] / div, s1 * b[2] / div, s1 * b[3] / div]
    )

    # Case 2 (†find_betas_approx_2): columns b11, b12, b22.
    b = lsq([0, 1, 2])
    beta1 = jnp.sqrt(jnp.abs(b[0]))
    beta2 = jnp.sqrt(jnp.abs(b[2]))
    # flip beta2's sign when b12 says the pair is anti-aligned
    beta2 = jnp.where(b[1] < 0, -beta2, beta2)
    betas_2 = jnp.array([beta1, beta2, 0.0, 0.0])

    # Case 3 (†find_betas_approx_3): columns b11, b12, b22, b13, b23.
    b = lsq([0, 1, 2, 3, 4])
    beta1 = jnp.sqrt(jnp.abs(b[0]))
    beta2 = jnp.where(b[1] < 0, -1.0, 1.0) * jnp.sqrt(jnp.abs(b[2]))
    beta3 = b[3] / jnp.where(beta1 > 1e-9, beta1, 1.0)
    betas_3 = jnp.array([beta1, beta2, beta3, 0.0])

    return jnp.stack([betas_1, betas_2, betas_3], axis=0)


def _gauss_newton(dv: jnp.ndarray, rho: jnp.ndarray, betas: jnp.ndarray):
    """†gauss_newton: refine beta (4,) on the 6 distance constraints.

    dv (4, 6, 3): per null-space basis vector, the 6 control-point pair
    difference vectors. Residual e_p = ||sum_i beta_i dv[i, p]||^2 - rho_p.
    """
    def body(_, b):
        s = jnp.einsum("i,ipk->pk", b, dv)            # (6, 3)
        e = jnp.sum(s * s, axis=-1) - rho             # (6,)
        J = 2.0 * jnp.einsum("pk,ipk->pi", s, dv)     # (6, 4)
        JtJ = J.T @ J + 1e-6 * jnp.eye(4, dtype=b.dtype)
        return b - jnp.linalg.solve(JtJ, J.T @ e)

    return jax.lax.fori_loop(0, N_GN_ITERS, body, betas)


def _epnp_weighted(pts_w: jnp.ndarray, obs_uv: jnp.ndarray, w: jnp.ndarray,
                   cam: Camera) -> jnp.ndarray:
    """Full EPnP on one weighted point set -> (4, 4) Tcw.

    w (S,) in [0, 1]: zero rows contribute nothing (Refine passes the inlier
    mask over the full candidate set; minimal sets pass all ones).
    """
    S = pts_w.shape[0]
    Cw = _control_points(pts_w, w)

    # Barycentric coordinates: [Cw; 1]^T alpha = [x; 1]
    CwH = jnp.concatenate([Cw.T, jnp.ones((1, 4), pts_w.dtype)], axis=0)
    XH = jnp.concatenate([pts_w.T, jnp.ones((1, S), pts_w.dtype)], axis=0)
    alphas = jnp.linalg.solve(CwH, XH).T  # (S, 4)

    # M matrix (2S x 12), rows scaled by sqrt(w) (†fill_M)
    u = obs_uv[:, 0]
    v = obs_uv[:, 1]
    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    zero = jnp.zeros_like(alphas)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    r1 = jnp.stack(
        [alphas * fu, zero, alphas * (uc - u)[:, None]], axis=2
    ).reshape(S, 12) * sw
    r2 = jnp.stack(
        [zero, alphas * fv, alphas * (vc - v)[:, None]], axis=2
    ).reshape(S, 12) * sw
    M = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    vbasis = V[:, :4].T.reshape(4, 4, 3)   # 4 smallest-eigval vectors

    # 6-pair distance system shared by the beta cases and Gauss-Newton.
    dv = vbasis[:, _PAIR_I, :] - vbasis[:, _PAIR_J, :]      # (4, 6, 3)
    dw = Cw[_PAIR_I] - Cw[_PAIR_J]                          # (6, 3)
    rho = jnp.sum(dw * dw, axis=-1)                         # (6,)
    # L (6, 10): quadratic-term design matrix, paper column order.
    ii = jnp.array([0, 0, 1, 0, 1, 2, 0, 1, 2, 3])
    jj = jnp.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3])
    coef = jnp.where(ii == jj, 1.0, 2.0)
    L = coef[None, :] * jnp.sum(dv[ii] * dv[jj], axis=-1).T  # (6, 10)

    betas0 = _betas_from_L(L, rho)                          # (3, 4)
    betas = jax.vmap(lambda b: _gauss_newton(dv, rho, b))(betas0)

    def pose_of(beta):
        Cc = jnp.einsum("i,ipk->pk", beta, vbasis)          # (4, 3)
        pc = alphas @ Cc                                    # (S, 3)
        # cheirality: weighted mean depth must be positive
        flip = jnp.where(jnp.sum(pc[:, 2] * w) < 0, -1.0, 1.0)
        Cc = Cc * flip
        _, R, t = geo.horn_align(Cw[None], Cc[None], with_scale=False)
        T = geo.se3_from_rt(R[0], t[0])
        pcam = pts_w @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(pcam[:, 2], 1e-6)
        du = fu * pcam[:, 0] / z + uc - u
        dvv = fv * pcam[:, 1] / z + vc - v
        sse = jnp.sum((du * du + dvv * dvv) * w)
        sse = jnp.where(jnp.all(jnp.isfinite(T)), sse, jnp.inf)
        return T, sse

    Ts, sses = jax.vmap(pose_of)(betas)
    best = jnp.argmin(sses)
    return Ts[best]


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray       # (4, 4) best hypothesis
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray        # () bool — enough inliers found


@functools.partial(jax.jit, static_argnames=("min_inliers",))
@precision.f32_matmuls
def pnp_ransac(
    cam: Camera,
    pts_w: jnp.ndarray,     # (N, 3) candidate map points
    obs_uv: jnp.ndarray,    # (N, 2) matched keypoint pixels
    sigma2: jnp.ndarray,    # (N,) octave variance
    valid: jnp.ndarray,     # (N,) bool
    samples: jnp.ndarray,   # (I, SAMPLE_SIZE) int32 host-sampled indices
    min_inliers: int = 10,
) -> PnPResult:
    """All-hypotheses-at-once EPnP RANSAC + all-inlier refine
    (†PnPsolver::iterate + †PnPsolver::Refine)."""
    ones = jnp.ones((samples.shape[1],), pts_w.dtype)
    hyp = jax.vmap(
        lambda s: _epnp_weighted(pts_w[s], obs_uv[s], ones, cam)
    )(samples)

    def count_inliers(T):
        pc = pts_w @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        chi2 = ((u - obs_uv[:, 0]) ** 2 + (v - obs_uv[:, 1]) ** 2) / sigma2
        inl = valid & (pc[:, 2] > 0.05) & (chi2 < CHI2_PNP)
        return inl, jnp.sum(inl.astype(jnp.int32))

    inls, counts = jax.vmap(count_inliers)(hyp)
    finite = jnp.all(jnp.isfinite(hyp.reshape(hyp.shape[0], -1)), axis=1)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    T_best, inl_best, n_best = hyp[best], inls[best], counts[best]

    # †Refine: EPnP on the winner's full inlier set, kept when it does not
    # lose inliers (the reference re-runs CheckInliers after refining).
    T_ref = _epnp_weighted(
        pts_w, obs_uv, inl_best.astype(pts_w.dtype) * valid, cam
    )
    inl_ref, n_ref = count_inliers(T_ref)
    n_ref = jnp.where(jnp.all(jnp.isfinite(T_ref)), n_ref, -1)
    use_ref = n_ref >= n_best
    return PnPResult(
        Tcw=jnp.where(use_ref, T_ref, T_best),
        inliers=jnp.where(use_ref, inl_ref, inl_best),
        n_inliers=jnp.where(use_ref, n_ref, n_best),
        ok=jnp.maximum(n_ref, n_best) >= min_inliers,
    )
