"""Stereo matching: left/right ORB correspondence along epipolar rows.

Re-design of †src/Frame.cc:ComputeStereoMatches (SURVEY §2.1 row 7): the
reference searches, per left keypoint, the right keypoints on nearby rows
within the disparity band, by descriptor distance, then refines to subpixel
with an 11x11 SAD scan. Here the row/disparity band is a pair mask and the
descriptor search is the usual Hamming matmul over ALL pairs at once; the
fork-join dual extraction disappears (two extractor calls, batchable).

`subpixel_refine` below implements the reference's 11x11 SAD parabola
refinement as one batched gather + vmapped window scan; tracking runs it on
every stereo frame (tracking.py _make_frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matching
from .orb import Features


@functools.partial(jax.jit, static_argnames=())
def stereo_match(
    left: Features,
    right: Features,
    bf: jnp.ndarray,
    min_depth: jnp.ndarray,
    scale_factors: jnp.ndarray,  # (n_levels,) per-octave scale
):
    """Match left->right features on epipolar rows; returns (ur, depth) per
    left feature (-1 where unmatched).

    Gates (†ComputeStereoMatches): row distance <= 2 * scale(octave_L),
    disparity in (0, bf / min_depth], octave within +-1, TH_HIGH descriptor
    distance with best/second ratio.
    """
    vr = right.xy[:, 1]
    vl = left.xy[:, 1]
    row_tol = 2.0 * scale_factors[left.octave]
    row_ok = jnp.abs(vl[:, None] - vr[None, :]) <= row_tol[:, None]
    disp = left.xy[:, 0:1] - right.xy[None, :, 0]
    max_disp = bf / jnp.maximum(min_depth, 1e-6)
    disp_ok = (disp > 0.1) & (disp <= max_disp)
    oct_ok = matching.octave_gate(left.octave, right.octave, lo=-1, hi=1)
    pair = row_ok & disp_ok & oct_ok

    res = matching.match_descriptors(
        left.desc, right.desc, left.valid, right.valid,
        pair_mask=pair, max_dist=matching.TH_HIGH, nn_ratio=0.9,
    )
    idx = jnp.maximum(res.idx, 0)
    ur = jnp.where(res.valid, right.xy[idx, 0], -1.0)
    d = left.xy[:, 0] - ur
    depth = jnp.where(res.valid & (d > 0.1), bf / jnp.maximum(d, 0.1), -1.0)
    ur = jnp.where(depth > 0, ur, -1.0)
    return ur, depth


SAD_W = 5      # half window (11x11, †ComputeStereoMatches w=5)
SAD_L = 5      # disparity search half range (+-5 px)


@functools.partial(jax.jit, static_argnames=())
def subpixel_refine(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    xy_l: jnp.ndarray,    # (N, 2) left keypoint coords (level-0 ints ok)
    ur0: jnp.ndarray,     # (N,) integer right-x from descriptor matching
    valid: jnp.ndarray,   # (N,)
    bf: jnp.ndarray,
):
    """Subpixel disparity via an 11x11 SAD scan + parabola fit
    (†ComputeStereoMatches ≈ the sliding-window block): returns refined
    (ur, depth).

    TPU formulation: one flat gather of the left 11x11 patch and one of a
    (11, 11+2*SAD_L) right strip per keypoint; the 11 SAD values come from a
    vectorized sliding difference over the strip; parabola interpolation
    gives the sub-pixel offset.
    """
    H, W = left_img.shape
    N = xy_l.shape[0]
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    xr = jnp.round(ur0).astype(jnp.int32)

    offs = jnp.arange(-SAD_W, SAD_W + 1)                       # (11,)
    rows = jnp.clip(yl[:, None] + offs[None, :], 0, H - 1)     # (N, 11)
    lcols = jnp.clip(xl[:, None] + offs[None, :], 0, W - 1)
    flat_l = left_img.reshape(-1)
    Lp = flat_l[rows[:, :, None] * W + lcols[:, None, :]]      # (N, 11, 11)

    strip_offs = jnp.arange(-SAD_W - SAD_L, SAD_W + SAD_L + 1)  # (21,)
    rcols = jnp.clip(xr[:, None] + strip_offs[None, :], 0, W - 1)
    flat_r = right_img.reshape(-1)
    Rs = flat_r[rows[:, :, None] * W + rcols[:, None, :]]      # (N, 11, 21)

    # 11 candidate shifts d in [-5, 5]: SAD_d = sum |Lp - Rs[:, :, d:d+11]|
    sads = []
    for d in range(2 * SAD_L + 1):
        sads.append(jnp.sum(jnp.abs(Lp - Rs[:, :, d : d + 2 * SAD_W + 1]),
                            axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)                              # (N, 11)
    best = jnp.argmin(sad, axis=1)
    b_in = jnp.clip(best, 1, 2 * SAD_L - 1)                    # parabola-safe
    s0 = jnp.take_along_axis(sad, b_in[:, None], 1)[:, 0]
    sm = jnp.take_along_axis(sad, (b_in - 1)[:, None], 1)[:, 0]
    sp = jnp.take_along_axis(sad, (b_in + 1)[:, None], 1)[:, 0]
    denom = sm - 2.0 * s0 + sp
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (sm - sp) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # refined right coordinate (†: reject if correction runs off the scan)
    ur = xr.astype(jnp.float32) + (b_in - SAD_L).astype(jnp.float32) + delta
    disp = xy_l[:, 0] - ur
    ok = valid & (disp > 0.05)
    depth = jnp.where(ok, bf / jnp.maximum(disp, 0.05), -1.0)
    ur = jnp.where(ok, ur, -1.0)
    return ur, depth
