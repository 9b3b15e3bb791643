"""Batched Sim3 RANSAC: closed-form Horn on 3-point sets + mutual reprojection.

Re-design of †src/Sim3Solver.cc (SURVEY §2.7): given matched 3D map points
expressed in the camera frames of two keyframes, every RANSAC hypothesis is a
3-correspondence Horn alignment (with scale for monocular, fixed scale for
stereo/RGB-D); inliers are pairs whose mutual reprojections agree within
th2 * sigma^2 in both images. All hypotheses evaluated as one vmapped batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import precision
from ..models.camera import Camera


class Sim3Result(NamedTuple):
    S12: jnp.ndarray       # (8,) sim3 vector mapping frame-2 coords -> frame-1
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fix_scale", "min_inliers"))
@precision.f32_matmuls
def sim3_ransac(
    cam: Camera,
    pts1_c: jnp.ndarray,   # (N, 3) matched points in KF1 camera frame
    pts2_c: jnp.ndarray,   # (N, 3) same points in KF2 camera frame
    sigma2_1: jnp.ndarray,  # (N,) octave variance of the kp in image 1
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    samples: jnp.ndarray,  # (I, 3) int32
    fix_scale: bool = False,
    min_inliers: int = 20,
    th2: float = 9.21,     # †Sim3Solver reprojection chi2 (2-DoF 99%)
) -> Sim3Result:
    def hyp_fn(idx):
        s, R, t = geo.horn_align(
            pts2_c[idx][None], pts1_c[idx][None], with_scale=not fix_scale
        )
        return geo.sim3_make(s[0], R[0], t[0])

    hyps = jax.vmap(hyp_fn)(samples)  # (I, 8)

    def count(S12):
        # project points of 2 into image 1 and vice versa (†CheckInliers)
        p2_in_1 = geo.sim3_apply(S12[None], pts2_c)
        p1_in_2 = geo.sim3_apply(geo.sim3_inverse(S12)[None], pts1_c)

        def reproj_chi2(pc, ref, s2):
            z = jnp.maximum(pc[:, 2], 1e-6)
            u = cam.fx * pc[:, 0] / z + cam.cx
            v = cam.fy * pc[:, 1] / z + cam.cy
            zr = jnp.maximum(ref[:, 2], 1e-6)
            ur = cam.fx * ref[:, 0] / zr + cam.cx
            vr = cam.fy * ref[:, 1] / zr + cam.cy
            return ((u - ur) ** 2 + (v - vr) ** 2) / s2

        e1 = reproj_chi2(p2_in_1, pts1_c, sigma2_1)
        e2 = reproj_chi2(p1_in_2, pts2_c, sigma2_2)
        inl = valid & (e1 < th2) & (e2 < th2)
        return inl, jnp.sum(inl.astype(jnp.int32))

    inls, counts = jax.vmap(count)(hyps)
    finite = jnp.all(jnp.isfinite(hyps), axis=1) & (geo.sim3_s(hyps) > 1e-4)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)

    # refine: Horn on all inliers of the best hypothesis
    w = inls[best].astype(pts1_c.dtype)
    s, R, t = geo.horn_align(
        pts2_c[None], pts1_c[None], weights=w[None], with_scale=not fix_scale
    )
    S_ref = geo.sim3_make(s[0], R[0], t[0])
    inl_ref, n_ref = count(S_ref)
    use_ref = n_ref >= counts[best]
    S_out = jnp.where(use_ref, S_ref, hyps[best])
    inl_out = jnp.where(use_ref, inl_ref, inls[best])
    n_out = jnp.where(use_ref, n_ref, counts[best])
    return Sim3Result(
        S12=S_out, inliers=inl_out, n_inliers=n_out, ok=n_out >= min_inliers
    )
