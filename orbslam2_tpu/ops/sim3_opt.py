"""Sim3 refinement + guided Sim3 match growing (loop-closing precision path).

Re-design of two reference pieces the round-1 build lacked (VERDICT item 3):

- †src/Optimizer.cc:OptimizeSim3 (≈L910-1080): LM refinement of the loop
  transform S12 over PAIRED reprojection edges — each matched point
  contributes a forward edge (project the loop-side point through S12 into
  image 1) and an inverse edge (project the current-side point through
  S12^-1 into image 2), with Huber(sqrt(10)), a 5-iteration pass, outlier
  removal at chi2>10 on either edge, and a longer second pass.
- †src/ORBmatcher.cc:SearchBySim3 (≈L890-1030): both-direction guided match
  growing between the RANSAC estimate and acceptance — project each KF's
  map points into the other image under S12 and keep mutually consistent
  descriptor matches, extending the correspondence set the refinement
  consumes.

TPU design: instead of g2o's per-edge graph, the whole problem is a single
7-parameter (6 with fixed scale) batched LM over statically shaped masked
residual arrays; the Jacobian comes from jax.jacfwd of the Sim3-tangent
retraction, and each LM step is a 7x7 solve — the entire two-phase schedule
runs inside one jitted program with lax control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import matching
from . import precision
from ..models.camera import Camera, in_image, project


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray        # (8,) refined sim3 (frame-2 coords -> frame-1)
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def _residuals(cam: Camera, S12, p1c, p2c, u1, u2, inv_s1, inv_s2):
    """Stacked scaled residuals (N, 4): [forward uv, inverse uv]."""
    pred1 = project(cam, geo.sim3_apply(S12[None], p2c))
    r1 = (u1 - pred1) * inv_s1[:, None]
    pred2 = project(cam, geo.sim3_apply(geo.sim3_inverse(S12)[None], p1c))
    r2 = (u2 - pred2) * inv_s2[:, None]
    return jnp.concatenate([r1, r2], axis=1)


@functools.partial(
    jax.jit, static_argnames=("fix_scale", "iters1", "iters2")
)
@precision.f32_matmuls
def optimize_sim3(
    cam: Camera,
    S12_0: jnp.ndarray,     # (8,) initial sim3 from RANSAC
    p1c: jnp.ndarray,       # (N, 3) matched points in KF1 camera frame
    p2c: jnp.ndarray,       # (N, 3) matched points in KF2 camera frame
    u1: jnp.ndarray,        # (N, 2) observed keypoints in image 1
    u2: jnp.ndarray,        # (N, 2) observed keypoints in image 2
    sigma2_1: jnp.ndarray,  # (N,)
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,     # (N,) bool
    fix_scale: bool = False,
    th2: float = 10.0,      # †OptimizeSim3 chi2 gate (both edges)
    iters1: int = 5,
    iters2: int = 10,
) -> Sim3OptResult:
    inv_s1 = 1.0 / jnp.sqrt(jnp.maximum(sigma2_1, 1e-9))
    inv_s2 = 1.0 / jnp.sqrt(jnp.maximum(sigma2_2, 1e-9))
    delta = jnp.sqrt(th2)   # Huber threshold on the scaled residual norm
    n_tan = 7

    def edge_chi2(S):
        r = _residuals(cam, S, p1c, p2c, u1, u2, inv_s1, inv_s2)
        c1 = jnp.sum(r[:, :2] ** 2, axis=1)
        c2 = jnp.sum(r[:, 2:] ** 2, axis=1)
        return c1, c2

    def lm_phase(S, mask, n_iters):
        def body(_, carry):
            S, lam = carry

            def res_flat(xi):
                Sx = geo.sim3_compose(geo.sim3_exp(xi), S)
                return _residuals(
                    cam, Sx, p1c, p2c, u1, u2, inv_s1, inv_s2
                ).reshape(-1)

            xi0 = jnp.zeros((n_tan,), p1c.dtype)
            r = res_flat(xi0)                       # (4N,)
            J = jax.jacfwd(res_flat)(xi0)           # (4N, 7)
            # Huber IRLS weights per edge (2 residual rows each)
            rr = r.reshape(-1, 4)
            e1 = jnp.sqrt(jnp.sum(rr[:, :2] ** 2, axis=1) + 1e-12)
            e2 = jnp.sqrt(jnp.sum(rr[:, 2:] ** 2, axis=1) + 1e-12)
            w1 = jnp.minimum(1.0, delta / e1)
            w2 = jnp.minimum(1.0, delta / e2)
            w = jnp.stack([w1, w1, w2, w2], axis=1).reshape(-1)
            w = w * jnp.repeat(mask.astype(r.dtype), 4)
            H = (J * w[:, None]).T @ J
            g = J.T @ (w * r)
            if fix_scale:
                # freeze the scale tangent dim by zeroing its row/col and
                # pinning the diagonal (update solves to exactly 0 there)
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n_tan)
            dx = -jnp.linalg.solve(Hd, g)
            S_new = geo.sim3_compose(geo.sim3_exp(dx), S)
            # accept if the robust cost decreased, else raise damping
            def cost(Sx):
                c1, c2 = edge_chi2(Sx)
                def hub(c):
                    e = jnp.sqrt(c + 1e-12)
                    return jnp.where(
                        e <= delta, c, 2.0 * delta * e - delta * delta
                    )
                return jnp.sum(mask * (hub(c1) + hub(c2)))
            better = cost(S_new) < cost(S)
            S = jnp.where(better, S_new, S)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            return S, jnp.clip(lam, 1e-6, 1e4)

        S, _ = jax.lax.fori_loop(0, n_iters, body, (S, jnp.float32(1e-3)))
        return S

    S = lm_phase(S12_0, valid, iters1)
    c1, c2 = edge_chi2(S)
    inl = valid & (c1 <= th2) & (c2 <= th2)
    S = lm_phase(S, inl, iters2)
    c1, c2 = edge_chi2(S)
    inl = valid & (c1 <= th2) & (c2 <= th2)
    return Sim3OptResult(
        S12=S, inliers=inl, n_inliers=jnp.sum(inl.astype(jnp.int32))
    )


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_by_sim3(
    cam: Camera,
    S12: jnp.ndarray,
    pos1_c: jnp.ndarray,    # (N1, 3) map points of KF1 in KF1 camera frame
    desc1: jnp.ndarray,     # (N1, 32) their feature descriptors
    valid1: jnp.ndarray,
    dmax1: jnp.ndarray,     # (N1,) scale-band max distance (PredictScale)
    kp_xy1: jnp.ndarray,    # (N1, 2) keypoints of image 1 (feature-aligned)
    kp_oct1: jnp.ndarray,
    pos2_c: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    dmax2: jnp.ndarray,
    kp_xy2: jnp.ndarray,
    kp_oct2: jnp.ndarray,
    scale_factor: jnp.ndarray,
    n_levels: int,
    radius_mult: float = 7.5,   # †SearchBySim3 th (3.5 * 1.2-ish window)
):
    """Both-direction guided projection match under S12; returns the mutual
    pair set as (idx2_of_1 (N1,), valid (N1,)) in feature-index space."""

    def one_direction(S, pos_src, dmax_src, desc_src, valid_src,
                      kp_xy_dst, kp_oct_dst, desc_dst, valid_dst):
        pc = geo.sim3_apply(S[None], pos_src)
        z = pc[:, 2]
        proj = project(cam, pc)
        dist = jnp.linalg.norm(pc, axis=1)
        ok = valid_src & (z > 0.1) & in_image(cam, proj)
        ratio = jnp.maximum(dmax_src / jnp.maximum(dist, 1e-9), 1e-6)
        pred = jnp.clip(
            jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32),
            0, n_levels - 1,
        )
        r_px = radius_mult * (scale_factor ** pred.astype(jnp.float32))
        pair = matching.radius_gate(proj, kp_xy_dst, r_px) & \
            matching.octave_gate(pred, kp_oct_dst, lo=-1, hi=1)
        return matching.match_descriptors(
            desc_src, desc_dst, ok, valid_dst,
            pair_mask=pair, max_dist=matching.TH_HIGH, nn_ratio=1.0,
        )

    res12 = one_direction(  # KF1 points into image 2 via S21
        geo.sim3_inverse(S12), pos1_c, dmax1, desc1, valid1,
        kp_xy2, kp_oct2, desc2, valid2,
    )
    res21 = one_direction(  # KF2 points into image 1 via S12
        S12, pos2_c, dmax2, desc2, valid2,
        kp_xy1, kp_oct1, desc1, valid1,
    )
    # agreement check (†SearchBySim3 final loop)
    i1 = jnp.arange(pos1_c.shape[0], dtype=jnp.int32)
    j = jnp.where(res12.valid, res12.idx, 0)
    mutual = res12.valid & (res21.idx[j] == i1) & res21.valid[j]
    return jnp.where(mutual, res12.idx, -1), mutual
