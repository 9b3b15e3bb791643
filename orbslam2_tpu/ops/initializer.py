"""Monocular map initialization: batched H/F RANSAC + model selection.

Re-design of †src/Initializer.cc (SURVEY §2.7, §2.9): the reference runs two
threads computing a homography and a fundamental matrix with 200 RANSAC
iterations each, scores both by symmetric transfer error, picks H if
RH = SH/(SH+SF) > 0.40, then decomposes (Faugeras 8 hypotheses for H, 4 for
E) and triangulation-checks each hypothesis.

Here the fork-join disappears into batching: all 200 hypotheses of BOTH
models are evaluated as one vmapped kernel (hypothesis axis = batch axis),
model selection is an argmax, and the decomposition candidates are checked as
another small batch. Same thresholds: sigma=1.0, chi2 5.991 (H) / 3.841+5.991
(F scoring), min 50 triangulated, parallax >= 1 degree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import geometry as geo

SIGMA = 1.0
TH_H = 5.991
TH_F = 3.841
TH_SCORE = 5.991
N_ITERS = 200
MIN_TRIANGULATED = 50
MIN_PARALLAX_DEG = 1.0


# ---------------------------------------------------------------------------
# Normalization (†Initializer::Normalize)
# ---------------------------------------------------------------------------

def normalize_points(x: jnp.ndarray, valid: jnp.ndarray):
    """Zero-mean unit-mean-abs-dev normalization. Returns (xn, T) with
    xn = T x (homogeneous)."""
    w = valid.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = jnp.abs(x - mean) * w[:, None]
    md = jnp.maximum(jnp.sum(d, axis=0) / n, 1e-8)
    s = 1.0 / md
    xn = (x - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        dtype=x.dtype,
    )
    return xn, T


# ---------------------------------------------------------------------------
# Minimal-set model fits (batched over hypotheses)
# ---------------------------------------------------------------------------

def _solve_h_dlt(
    p1: jnp.ndarray, p2: jnp.ndarray, w: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """H21 from >= 4 correspondences (2 DLT rows each): p2 ~ H p1. (..., M, 2).

    `w` (..., M) enables the weighted all-inlier refinement pass."""
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2M, 9)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def _solve_f_8point(
    p1: jnp.ndarray, p2: jnp.ndarray, w: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """F21 from >= 8 correspondences: x2^T F21 x1 = 0. (..., M, 2).

    With `w` (..., M) this doubles as the all-inlier least-squares refinement
    used after RANSAC (weighted normal equations, same eigh path)."""
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # (..., M, 9)
    if w is not None:
        A = A * w[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    f = V[..., :, 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Enforce rank 2.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt)


# ---------------------------------------------------------------------------
# Symmetric transfer scoring (†CheckHomography / †CheckFundamental)
# ---------------------------------------------------------------------------

def score_homography(H21, x1, x2, valid, sigma=SIGMA):
    H12 = jnp.linalg.inv(H21)
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(H, a, b):
        w = H[..., 2, 0] * a[..., 0] + H[..., 2, 1] * a[..., 1] + H[..., 2, 2]
        iw = 1.0 / jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        u = (H[..., 0, 0] * a[..., 0] + H[..., 0, 1] * a[..., 1] + H[..., 0, 2]) * iw
        v = (H[..., 1, 0] * a[..., 0] + H[..., 1, 1] * a[..., 1] + H[..., 1, 2]) * iw
        return ((u - b[..., 0]) ** 2 + (v - b[..., 1]) ** 2) * inv_s2

    chi2_21 = transfer(H21[..., None, :, :], x1, x2)
    chi2_12 = transfer(H12[..., None, :, :], x2, x1)
    in1 = (chi2_21 < TH_H) & valid
    in2 = (chi2_12 < TH_H) & valid
    score = jnp.sum(jnp.where(in1, TH_H - chi2_21, 0.0), axis=-1) + jnp.sum(
        jnp.where(in2, TH_H - chi2_12, 0.0), axis=-1
    )
    return score, in1 & in2


def score_fundamental(F21, x1, x2, valid, sigma=SIGMA):
    inv_s2 = 1.0 / (sigma * sigma)

    def line_chi2(F, a, b):
        # line in b's image: l = F a
        l0 = F[..., 0, 0] * a[..., 0] + F[..., 0, 1] * a[..., 1] + F[..., 0, 2]
        l1 = F[..., 1, 0] * a[..., 0] + F[..., 1, 1] * a[..., 1] + F[..., 1, 2]
        l2 = F[..., 2, 0] * a[..., 0] + F[..., 2, 1] * a[..., 1] + F[..., 2, 2]
        num = l0 * b[..., 0] + l1 * b[..., 1] + l2
        return (num * num) / jnp.maximum(l0 * l0 + l1 * l1, 1e-12) * inv_s2

    chi2_2 = line_chi2(F21[..., None, :, :], x1, x2)
    F12 = jnp.swapaxes(F21, -1, -2)
    chi2_1 = line_chi2(F12[..., None, :, :], x2, x1)
    in2 = (chi2_2 < TH_F) & valid
    in1 = (chi2_1 < TH_F) & valid
    score = jnp.sum(jnp.where(in2, TH_SCORE - chi2_2, 0.0), axis=-1) + jnp.sum(
        jnp.where(in1, TH_SCORE - chi2_1, 0.0), axis=-1
    )
    return score, in1 & in2


# ---------------------------------------------------------------------------
# Hypothesis decomposition
# ---------------------------------------------------------------------------

def decompose_essential(E: jnp.ndarray):
    """4 (R, t) hypotheses from an essential matrix (†DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H21: jnp.ndarray, K: jnp.ndarray):
    """8 (R, t, n) hypotheses via Faugeras SVD decomposition (†ReconstructH)."""
    A = jnp.linalg.inv(K) @ H21 @ K
    U, S, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    V = Vt.T

    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    e1 = jnp.array([1.0, -1.0, 1.0, -1.0], A.dtype)
    e3 = jnp.array([1.0, 1.0, -1.0, -1.0], A.dtype)

    def rt_case(dprime_sign):
        # dprime_sign = +1: d' = d2 ; -1: d' = -d2
        if dprime_sign > 0:
            stheta = jnp.sqrt(
                jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
            ) / jnp.maximum((d1 + d3) * d2, 1e-12)
            ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
            st = e1 * e3 * stheta
            Rp = jnp.stack(
                [
                    jnp.stack([jnp.full((4,), ctheta), jnp.zeros(4), -st], -1),
                    jnp.stack([jnp.zeros(4), jnp.ones(4), jnp.zeros(4)], -1),
                    jnp.stack([st, jnp.zeros(4), jnp.full((4,), ctheta)], -1),
                ],
                axis=-2,
            )  # (4, 3, 3)
            tp = jnp.stack([e1 * x1, jnp.zeros(4), -e3 * x3], -1) * (d1 - d3)
        else:
            sphi = jnp.sqrt(
                jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
            ) / jnp.maximum((d1 - d3) * d2, 1e-12)
            cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
            sp = e1 * e3 * sphi
            Rp = jnp.stack(
                [
                    jnp.stack([jnp.full((4,), cphi), jnp.zeros(4), sp], -1),
                    jnp.stack([jnp.zeros(4), -jnp.ones(4), jnp.zeros(4)], -1),
                    jnp.stack([sp, jnp.zeros(4), jnp.full((4,), -cphi)], -1),
                ],
                axis=-2,
            )
            tp = jnp.stack([e1 * x1, jnp.zeros(4), e3 * x3], -1) * (d1 + d3)
        R = s * (U @ Rp @ Vt)
        t = jnp.einsum("ij,nj->ni", U, tp)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        return R, t

    Ra, ta = rt_case(+1)
    Rb, tb = rt_case(-1)
    return jnp.concatenate([Ra, Rb]), jnp.concatenate([ta, tb])


# ---------------------------------------------------------------------------
# Cheirality / parallax check (†CheckRT)
# ---------------------------------------------------------------------------

def check_rt(R, t, x1, x2, valid, K, sigma=SIGMA):
    """Triangulate under hypothesis (R, t) and count good points.

    Returns (n_good, good_mask, points3d, parallax_deg_med50)."""
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], 1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = geo.triangulate_dlt(P1, P2, x1, x2)  # (N, 3) in cam1 frame
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    O1 = jnp.zeros(3, K.dtype)
    O2 = -R.T @ t
    n1 = X - O1
    n2 = X - O2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]

    th2 = 4.0 * sigma * sigma

    def reproj_err(P, X):
        Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1)
        x = Xh @ P.T
        return x[:, :2] / jnp.where(jnp.abs(x[:, 2:3]) < 1e-8, 1e-8, x[:, 2:3])

    e1 = jnp.sum((reproj_err(P1, X) - x1) ** 2, axis=-1)
    e2 = jnp.sum((reproj_err(P2, X) - x2) ** 2, axis=-1)

    good_parallax = cos_par < 0.99998  # †CheckRT threshold
    good = (
        valid
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (e1 < th2)
        & (e2 < th2)
        & good_parallax
    )
    n_good = jnp.sum(good.astype(jnp.int32))
    # parallax statistic: reference takes the 50th-smallest parallax angle
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)))
    par_sorted = jnp.sort(jnp.where(good, par_deg, 1e9))
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = par_sorted[idx]
    return n_good, good, X, parallax


# ---------------------------------------------------------------------------
# Full initialization
# ---------------------------------------------------------------------------

class InitResult(NamedTuple):
    success: jnp.ndarray     # () bool
    used_homography: jnp.ndarray  # () bool
    T21: jnp.ndarray         # (4, 4) pose of frame 2 wrt frame 1 (t unit-norm)
    points3d: jnp.ndarray    # (N, 3) triangulated points (frame-1 camera coords)
    good: jnp.ndarray        # (N,) bool triangulated-point mask


def initialize_two_view(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    samples: jnp.ndarray,
) -> InitResult:
    """Full two-view SfM bootstrap from matched undistorted pixel coords.

    Args:
      x1, x2: (N, 2) matched keypoint coords in frames 1 and 2.
      valid:  (N,) bool match mask.
      K:      (3, 3) intrinsics.
      samples: (N_ITERS, 8) int32 indices of minimal sets (host-sampled from
        valid matches; passing them in keeps this function pure).
    """
    x1n, T1 = normalize_points(x1, valid)
    x2n, T2 = normalize_points(x2, valid)
    T2inv = jnp.linalg.inv(T2)

    p1 = x1n[samples]  # (ITERS, 8, 2)
    p2 = x2n[samples]

    # --- all H and F hypotheses in one batch each
    Hn = _solve_h_dlt(p1, p2)                       # (ITERS, 3, 3)
    H21 = T2inv @ Hn @ T1
    h_scores, _ = score_homography(H21, x1[None], x2[None], valid[None])
    best_h = jnp.argmax(h_scores)
    SH = h_scores[best_h]

    Fn = _solve_f_8point(p1, p2)
    F21 = T2.T @ Fn @ T1
    f_scores, _ = score_fundamental(F21, x1[None], x2[None], valid[None])
    best_f = jnp.argmax(f_scores)
    SF = f_scores[best_f]

    # --- all-inlier least-squares refinement of the winning minimal models
    # (improvement over the reference, which decomposes the raw minimal-set
    # model; at small parallax the minimal F is too noisy to decompose well)
    _, h_inl = score_homography(H21[best_h], x1, x2, valid)
    Hn_ref = _solve_h_dlt(x1n, x2n, w=h_inl.astype(x1.dtype))
    H_best = T2inv @ Hn_ref @ T1

    _, f_inl = score_fundamental(F21[best_f], x1, x2, valid)
    Fn_ref = _solve_f_8point(x1n, x2n, w=f_inl.astype(x1.dtype))
    F_best = T2.T @ Fn_ref @ T1

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40

    # --- decompose both models (cheap) and pick the winning hypothesis set
    Rs_f, ts_f = decompose_essential(K.T @ F_best @ K)
    Rs_h, ts_h = decompose_homography(H_best, K)
    Rs = jnp.concatenate([Rs_h, jnp.concatenate([Rs_f, Rs_f])])  # (8+8, 3, 3)
    ts = jnp.concatenate([ts_h, jnp.concatenate([ts_f, ts_f])])
    hyp_valid = jnp.concatenate(
        [jnp.full((8,), True), jnp.full((4,), True), jnp.full((4,), False)]
    )
    # select the 8-row window for the chosen model
    Rs = jnp.where(use_h, Rs[:8], Rs[8:])
    ts = jnp.where(use_h, ts[:8], ts[8:])
    hyp_mask = jnp.where(use_h, hyp_valid[:8], hyp_valid[8:])

    n_good, good, X, parallax = jax.vmap(
        lambda R, t: check_rt(R, t, x1, x2, valid, K)
    )(Rs, ts)
    n_good = jnp.where(hyp_mask, n_good, -1)

    order = jnp.argsort(-n_good)
    bi = order[0]
    n_best = n_good[bi]
    n_second = n_good[order[1]]

    n_valid = jnp.sum(valid.astype(jnp.int32))
    # †ReconstructF/H acceptance: clear winner, enough points, enough
    # parallax. (0.5*n_valid instead of the reference's 0.9 — our matcher is
    # stricter than the reference's window search, so the match set is
    # already high-precision; validated by the init tests.)
    min_good = jnp.maximum(
        jnp.array(MIN_TRIANGULATED, jnp.int32), (0.5 * n_valid).astype(jnp.int32)
    )
    success = (
        (n_best >= min_good)
        & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & (parallax[bi] > MIN_PARALLAX_DEG)
    )

    T21 = geo.se3_from_rt(Rs[bi], ts[bi])
    return InitResult(
        success=success,
        used_homography=use_h,
        T21=T21,
        points3d=X[bi],
        good=good[bi] & success,
    )
