"""Batched EPnP + RANSAC for relocalization.

Re-design of †src/PnPsolver.cc (SURVEY §2.7): the reference runs EPnP
(Lepetit et al.) inside an adaptive RANSAC, one hypothesis at a time. Here
all hypotheses are evaluated as one vmapped batch (SURVEY §7.1): each
hypothesis takes a 6-point minimal-ish set, computes the 4 EPnP control
points (centroid + PCA axes), barycentric coordinates, the 12x12 normal
matrix's null vector (beta case N=1), recovers the camera-frame control
points by sign/scale alignment, and closes with Horn absolute orientation.

Deviation from the reference (documented): we use the N=1 beta case with
6-point sets instead of the full beta-case enumeration + Gauss-Newton on
4-point sets — batched-friendly, and the pose is refined by motion-only LM
(ops.pose_opt) immediately afterwards in the relocalization flow, exactly as
the reference refines with PoseOptimization. Accuracy is validated in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from ..models.camera import Camera

SAMPLE_SIZE = 6
CHI2_PNP = 5.991


def _epnp_single(pts_w: jnp.ndarray, obs_uv: jnp.ndarray, cam: Camera):
    """EPnP (beta case N=1) on one sample: (S, 3) world pts, (S, 2) pixels.

    Returns (4, 4) Tcw hypothesis.
    """
    S = pts_w.shape[0]
    # Control points: centroid + principal axes (†choose_control_points)
    c0 = jnp.mean(pts_w, axis=0)
    centered = pts_w - c0
    cov = centered.T @ centered / S
    evals, evecs = jnp.linalg.eigh(cov)
    # scale axes by sqrt eigenvalue (paper's convention)
    axes = evecs * jnp.sqrt(jnp.maximum(evals, 1e-9))[None, :]
    Cw = jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)  # (4, 3)

    # Barycentric coordinates: [Cw; 1]^T alpha = [x; 1]
    CwH = jnp.concatenate([Cw.T, jnp.ones((1, 4), pts_w.dtype)], axis=0)  # (4, 4)
    XH = jnp.concatenate([pts_w.T, jnp.ones((1, S), pts_w.dtype)], axis=0)
    alphas = jnp.linalg.solve(CwH, XH).T  # (S, 4)

    # M matrix (2S x 12) (†fill_M)
    u = obs_uv[:, 0]
    v = obs_uv[:, 1]
    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    zero = jnp.zeros_like(alphas)
    r1 = jnp.stack([alphas * fu, zero, alphas * (uc - u)[:, None]], axis=2)  # (S,4,3)
    r2 = jnp.stack([zero, alphas * fv, alphas * (vc - v)[:, None]], axis=2)
    M = jnp.concatenate(
        [r1.reshape(S, 12), r2.reshape(S, 12)], axis=0
    )  # (2S, 12)
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    vnull = V[:, 0].reshape(4, 3)  # camera control points up to scale/sign

    # Scale/sign (beta case N=1): match inter-control-point distances
    def pdists(C):
        d = C[:, None, :] - C[None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    dw = pdists(Cw)
    dc = pdists(vnull)
    beta = jnp.sum(dw * dc) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    Cc = beta * vnull
    # points must be in front: flip if mean z < 0
    pc = alphas @ Cc
    flip = jnp.where(jnp.mean(pc[:, 2]) < 0, -1.0, 1.0)
    Cc = Cc * flip

    # Pose from control-point correspondence (†compute_R_and_t uses Horn)
    s, R, t = geo.horn_align(Cw[None], Cc[None], with_scale=False)
    return geo.se3_from_rt(R[0], t[0])


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray       # (4, 4) best hypothesis
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray        # () bool — enough inliers found


@functools.partial(jax.jit, static_argnames=("min_inliers",))
def pnp_ransac(
    cam: Camera,
    pts_w: jnp.ndarray,     # (N, 3) candidate map points
    obs_uv: jnp.ndarray,    # (N, 2) matched keypoint pixels
    sigma2: jnp.ndarray,    # (N,) octave variance
    valid: jnp.ndarray,     # (N,) bool
    samples: jnp.ndarray,   # (I, SAMPLE_SIZE) int32 host-sampled indices
    min_inliers: int = 10,
) -> PnPResult:
    """All-hypotheses-at-once EPnP RANSAC (†PnPsolver::iterate)."""
    hyp = jax.vmap(lambda s: _epnp_single(pts_w[s], obs_uv[s], cam))(samples)

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
    return PnPResult(
        Tcw=hyp[best],
        inliers=inls[best],
        n_inliers=counts[best],
        ok=counts[best] >= min_inliers,
    )
