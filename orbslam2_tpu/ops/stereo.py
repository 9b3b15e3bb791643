"""Stereo matching: left/right ORB correspondence along epipolar rows.

Re-design of †src/Frame.cc:ComputeStereoMatches (SURVEY §2.1 row 7): the
reference searches, per left keypoint, the right keypoints on nearby rows
within the disparity band, by descriptor distance, then refines to subpixel
with an 11x11 SAD scan. Here the row/disparity band is a pair mask and the
descriptor search is the usual Hamming matmul over ALL pairs at once; the
fork-join dual extraction disappears (two extractor calls, batchable).

Subpixel SAD refinement is deliberately deferred (documented deviation):
disparity quantization at integer keypoint coords gives depth error
z^2/(bf) * 0.5px — acceptable until validated otherwise by the accuracy
harness.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def stereo_depth_for_tracker(left_img, right_img, cam, extr_cfg):
    """Legacy dense-map shim (unused by the tracker's native stereo path)."""
    raise NotImplementedError(
        "use Tracker's right_img path; dense stereo depth is not provided"
    )
