"""Batched Lie-group geometry: SO(3), SE(3), Sim(3), Horn alignment, triangulation.

TPU-native replacement for the reference's Eigen + g2o type zoo
(†src/Converter.cc, †Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}): everything
here is a pure jnp function over float32 arrays, usable under jit/vmap/grad.

Conventions (same as the reference):
  - `Tcw` is the 4x4 camera-from-world transform; `Twc = inv(Tcw)`.
  - Rotations are 3x3 matrices; quaternions are (w, x, y, z), unit norm.
  - Sim3 is parameterized as (s, R, t) acting as  x -> s * R @ x + t.
  - Tangent vectors: se3 = (rho[3], phi[3]) translation-first;
    sim3 = (rho[3], phi[3], sigma) with s = exp(sigma).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3)."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Taylor-expanded near zero so it is jit-safe and differentiable everywhere.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2 with small-angle Taylor fallback
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Handles angles near 0 and near pi (via the symmetric-part diagonal).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_generic = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    # sin^2(theta) as a polynomial in R — smooth, and much better conditioned
    # near theta=0 than arccos(trace) (f32 trace resolves theta only to ~3e-4)
    sin2 = 0.25 * jnp.sum(w_generic * w_generic, axis=-1)
    # arccos'(x) -> inf as x -> 1, which turns into NaN tangents under
    # jacfwd for near-identity rotations; differentiate it at a safe point
    # (double-where) and use the sin^2-based Taylor in the small region.
    small = cos_t > 1.0 - 1e-5
    # the lower clamp likewise keeps arccos' tangent finite at theta ~ pi,
    # where the w_pi branch below supplies the actual output
    cos_safe = jnp.clip(jnp.where(small, 0.0, cos_t), -1.0 + 1e-7, 1.0)
    theta = jnp.where(small, jnp.sqrt(sin2 + _EPS * _EPS), jnp.arccos(cos_safe))
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        small,
        0.5 + sin2 / 12.0,  # Taylor of theta/(2 sin theta), theta^2 ~ sin^2
        theta / (2.0 * jnp.maximum(sin_t, _EPS)),
    )
    w = w_generic * scale[..., None]
    # Near pi: sin(theta) ~ 0 makes the generic form unstable. At theta = pi,
    # R + I = 2 n n^T, so every nonzero column of (R + I) is parallel to the
    # axis; take the largest-norm column (branch-free via argmax).
    near_pi = cos_t < -1.0 + 1e-4
    RpI = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    col_norms = jnp.sum(RpI * RpI, axis=-2)  # (..., 3)
    best = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(RpI, best[..., None, None].repeat(3, axis=-2), axis=-1)[
        ..., :, 0
    ]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    # arccos is ill-conditioned at theta ~ pi; recover theta from the skew
    # part instead: |vee(R - R^T)| = 2 sin(theta), well-conditioned there.
    sin_small = jnp.clip(
        0.5 * jnp.linalg.norm(w_generic, axis=-1), 0.0, 1.0
    )
    theta_pi = jnp.pi - jnp.arcsin(sin_small)
    # Align the sign of axis with the skew part when it is not exactly zero.
    dot = jnp.sum(axis * w_generic, axis=-1)
    axis = axis * jnp.where(dot < 0, -1.0, 1.0)[..., None]
    w_pi = axis * theta_pi[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * (K @ K)


# ---------------------------------------------------------------------------
# SE(3) — 4x4 matrices
# ---------------------------------------------------------------------------

def se3_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def se3_translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform (no general solve).

    Valid only while R is orthonormal — see se3_orthonormalize for poses
    produced by long chains of f32 compositions.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (Gram-Schmidt + cross).

    Poses that are repeatedly composed in f32 (pose-LM outputs chained over
    hundreds of frames) drift off the manifold; the closed-form se3_inverse
    then stops being an inverse and the error compounds ~2x per composition
    (measured: a device-resident pose chain diverged from the host
    true-inverse path at x2.4/frame until tracking failed). Re-projecting
    each link keeps the chain exactly rigid.
    """
    R = T[..., :3, :3]
    r0 = R[..., :, 0]
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-12)
    r1 = R[..., :, 1]
    r1 = r1 - jnp.sum(r1 * r0, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(r0, r1)
    Ro = jnp.stack([r0, r1, r2], axis=-1)
    return se3_from_rt(Ro, T[..., :3, 3])


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist (rho, phi) -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return se3_from_rt(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist (rho, phi)."""
    phi = so3_log(T[..., :3, :3])
    V = so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) (or (..., 3)) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= 2 and T.ndim >= 2 and pts.shape[-2:] != (3,):
        pass
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def apply_se3(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., 3) single points."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Branch-free Shepperd method via 4-case select (jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best one.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    c0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    c1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    c2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    c3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    # Canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


# ---------------------------------------------------------------------------
# Sim(3) — (s, R, t) tuples, stored as a (..., 8) vector [s, q(4), t(3)]
# ---------------------------------------------------------------------------

def sim3_make(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack (scalar, 3x3, 3) into the (..., 8) Sim3 vector [s, qwxyz, t]."""
    q = rotmat_to_quat(R)
    return jnp.concatenate([jnp.asarray(s)[..., None], q, t], axis=-1)


def sim3_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype)


def sim3_s(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 0]


def sim3_R(S: jnp.ndarray) -> jnp.ndarray:
    return quat_to_rotmat(S[..., 1:5])


def sim3_t(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 5:8]


def sim3_apply(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """x -> s R x + t for (..., 3) points."""
    return (
        sim3_s(S)[..., None] * jnp.einsum("...ij,...j->...i", sim3_R(S), p) + sim3_t(S)
    )


def sim3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A ∘ B: apply B first, then A."""
    sA, RA, tA = sim3_s(A), sim3_R(A), sim3_t(A)
    sB, RB, tB = sim3_s(B), sim3_R(B), sim3_t(B)
    s = sA * sB
    R = RA @ RB
    t = sA[..., None] * jnp.einsum("...ij,...j->...i", RA, tB) + tA
    return sim3_make(s, R, t)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    s, R, t = sim3_s(S), sim3_R(S), sim3_t(S)
    s_inv = 1.0 / jnp.maximum(s, _EPS)
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return sim3_make(s_inv, Rt, t_inv)


def sim3_from_se3(T: jnp.ndarray, s=1.0) -> jnp.ndarray:
    return sim3_make(
        jnp.broadcast_to(jnp.asarray(s, T.dtype), T.shape[:-2]),
        T[..., :3, :3],
        T[..., :3, 3],
    )


def se3_from_sim3(S: jnp.ndarray) -> jnp.ndarray:
    """Project Sim3 back to SE3 by dividing translation by scale.

    Matches the reference's loop-correction write-back `[R t/s; 0 1]`
    (†src/Optimizer.cc:OptimizeEssentialGraph write-back, SURVEY §2.6).
    """
    s = jnp.maximum(sim3_s(S), _EPS)
    return se3_from_rt(sim3_R(S), sim3_t(S) / s[..., None])


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) tangent (rho, phi, sigma) -> Sim3 vector.

    Uses the exact Sim(3) W matrix (Strasdat's thesis): t = W rho.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi / jnp.maximum(theta, _EPS)[..., None])  # unit-axis skew
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta < 1e-5
    # Coefficients A, B, C of W = A K + B K^2 + C I  (unit-axis form)
    C = jnp.where(small_sig, 1.0 + sig / 2.0 + sig * sig / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sig))

    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    th_sq = theta * theta
    sig_sq = sig * sig
    denom = jnp.maximum(sig_sq + th_sq, _EPS)

    A_gen = (a_ * sig + (1.0 - b_) * theta) / (jnp.maximum(theta, _EPS) * denom)
    B_gen = (C - ((b_ - 1.0) * sig + a_ * theta) / denom) / jnp.maximum(th_sq, _EPS)
    # sigma ~ 0 branch
    A_s0 = (1.0 - jnp.cos(theta)) / jnp.maximum(th_sq, _EPS)
    B_s0 = (theta - jnp.sin(theta)) / jnp.maximum(th_sq * theta, _EPS)
    # theta ~ 0 branch
    A_t0 = jnp.zeros_like(theta)
    B_t0 = jnp.zeros_like(theta)

    A = jnp.where(small_th, A_t0, jnp.where(small_sig, A_s0 * theta, A_gen * theta))
    B = jnp.where(small_th, B_t0, jnp.where(small_sig, B_s0 * th_sq, B_gen * th_sq))
    # Note: A,B above are for the unit-axis K (factors of theta folded in).
    W = A[..., None, None] * K + B[..., None, None] * (K @ K) + C[..., None, None] * eye
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return sim3_make(s, R, t)


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sim3_exp: Sim3 vector (..., 8) -> tangent (..., 7).

    rho is recovered by solving W rho = t with the same W-matrix
    coefficients used in sim3_exp.
    """
    s = jnp.maximum(sim3_s(S), _EPS)
    sigma = jnp.log(s)
    R = sim3_R(S)
    phi = so3_log(R)
    t = sim3_t(S)

    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi / jnp.maximum(theta, _EPS)[..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), K.shape)

    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta < 1e-5
    C = jnp.where(
        small_sig, 1.0 + sig / 2.0 + sig * sig / 6.0,
        (s - 1.0) / jnp.where(small_sig, 1.0, sig),
    )
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    th_sq = theta * theta
    sig_sq = sig * sig
    denom = jnp.maximum(sig_sq + th_sq, _EPS)
    A_gen = (a_ * sig + (1.0 - b_) * theta) / (jnp.maximum(theta, _EPS) * denom)
    B_gen = (C - ((b_ - 1.0) * sig + a_ * theta) / denom) / jnp.maximum(th_sq, _EPS)
    A_s0 = (1.0 - jnp.cos(theta)) / jnp.maximum(th_sq, _EPS)
    B_s0 = (theta - jnp.sin(theta)) / jnp.maximum(th_sq * theta, _EPS)
    A = jnp.where(small_th, 0.0, jnp.where(small_sig, A_s0 * theta, A_gen * theta))
    B = jnp.where(small_th, 0.0, jnp.where(small_sig, B_s0 * th_sq, B_gen * th_sq))
    W = A[..., None, None] * K + B[..., None, None] * (K @ K) + C[..., None, None] * eye
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Horn absolute orientation (closed form, with optional scale)
# ---------------------------------------------------------------------------

def horn_align(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
):
    """Closed-form similarity aligning src -> dst:  dst ≈ s R src + t.

    Horn (1987) quaternion method — the same algorithm the reference uses in
    †src/Sim3Solver.cc:ComputeSim3 and the TUM evaluate_ate.py script.

    Args:
      src, dst: (..., N, 3) paired points.
      weights:  optional (..., N) nonnegative weights (e.g. RANSAC masks).
      with_scale: solve for scale s (monocular); else s = 1.

    Returns: (s, R, t) with shapes (...,), (..., 3, 3), (..., 3).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), _EPS)
    w = (weights / wsum)[..., None]
    mu_src = jnp.sum(src * w, axis=-2)
    mu_dst = jnp.sum(dst * w, axis=-2)
    sc = src - mu_src[..., None, :]
    dc = dst - mu_dst[..., None, :]
    # Weighted correlation M_ij = sum_n w_n * sc_i * dc_j  (3x3); this
    # orientation makes the largest eigenvector of N below equal the
    # quaternion of R with dst = R src (verified numerically).
    M = jnp.einsum("...ni,...nj->...ij", sc * w, dc)
    # Horn's symmetric 4x4 N matrix; largest eigenvector = optimal quaternion.
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1),
        ],
        axis=-2,
    )
    evals, evecs = jnp.linalg.eigh(N)  # ascending
    q = evecs[..., :, -1]  # (..., 4) = (w, x, y, z) by construction of N
    R = quat_to_rotmat(q)
    if with_scale:
        # Symmetric scale (Horn): s = sqrt( sum|dc|^2 / sum|sc|^2 ) is the
        # symmetric form; the asymmetric LS form is <dc, R sc> / |sc|^2.
        Rs = jnp.einsum("...ij,...nj->...ni", R, sc)
        num = jnp.sum(jnp.sum(dc * Rs, axis=-1) * weights / wsum, axis=-1)
        den = jnp.maximum(
            jnp.sum(jnp.sum(sc * sc, axis=-1) * weights / wsum, axis=-1), _EPS
        )
        s = num / den
    else:
        s = jnp.ones(src.shape[:-2], dtype=src.dtype)
    t = mu_dst - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_src)
    return s, R, t


# ---------------------------------------------------------------------------
# Two-view triangulation (batched DLT)
# ---------------------------------------------------------------------------

def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Linear triangulation, same DLT as †src/Initializer.cc:Triangulate.

    Args:
      P1, P2: (..., 3, 4) projection matrices (K [R|t]).
      x1, x2: (..., N, 2) pixel coordinates in each view.
    Returns: (..., N, 3) world points.
    """
    # Build the 4x4 A per point: rows x*P3-P1, y*P3-P2 for both views.
    def rows(P, x):
        u, v = x[..., 0:1], x[..., 1:2]
        p0 = P[..., None, 0, :]
        p1 = P[..., None, 1, :]
        p2 = P[..., None, 2, :]
        return jnp.stack([u * p2 - p0, v * p2 - p1], axis=-2)  # (..., N, 2, 4)

    A = jnp.concatenate([rows(P1, x1), rows(P2, x2)], axis=-2)  # (..., N, 4, 4)
    # Smallest right singular vector of A, i.e. the smallest eigenvector of
    # the 4x4 Gram matrix. jnp.linalg.eigh lowers batched tiny eigenproblems
    # to an iterative Jacobi loop of scalar ops on TPU (~40 ms for the
    # 10x1500 triangulation batch); damped inverse iteration with the
    # unrolled SPD solve converges to the same vector in 3 steps — the
    # smallest/second eigenvalue ratio is the DLT residual over the data
    # scale, ~1e-4 or better, so each step gains ~4 digits.
    from . import linalg_small

    # HIGHEST: A entries are O(pixel * focal) ~ 1e3-1e6; a bf16 Gram matrix
    # loses the triangulation entirely (0.4 m errors on exact data).
    AtA = jnp.einsum("...ki,...kj->...ij", A, A,
                     precision=jax.lax.Precision.HIGHEST)
    # Diagonal equilibration: pixel columns and the homogeneous column
    # differ by ~f^2 in scale; B = D AtA D with D = diag(AtA)^-1/2 brings
    # f32 inverse iteration to f64-eigh accuracy (verified 1.6e-5 m vs
    # 1.8e-5 m max on exact 1504-point data).
    diag = jnp.diagonal(AtA, axis1=-2, axis2=-1)
    d = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
    B = AtA * d[..., None, :] * d[..., :, None]
    tr = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
    damped = B + (1e-7 * tr + 1e-12) * jnp.eye(4, dtype=B.dtype)
    Y = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], B.dtype), B.shape[:-1]
    )
    for _ in range(3):
        Y = linalg_small.solve_spd_small(damped, Y)
        Y = Y / jnp.maximum(
            jnp.linalg.norm(Y, axis=-1, keepdims=True), _EPS
        )
    X = Y * d
    w = X[..., 3]
    # preserve the sign without cancellation (sign(w)*eps+eps == 0 for w<0)
    safe_w = jnp.where(jnp.abs(w) < _EPS, jnp.where(w < 0, -_EPS, _EPS), w)
    return X[..., :3] / safe_w[..., None]
