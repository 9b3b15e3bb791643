"""Descriptor matching as MXU matmuls: the ORBmatcher re-design.

The reference's ORBmatcher (†src/ORBmatcher.cc, SURVEY §2.5) is ~1800 LoC of
per-keypoint loops with popcount Hamming distance and hand-maintained best/
second-best bookkeeping. Here every overload is the same batched pattern:

    pair_mask (geometry gates)  ->  masked Hamming top-2  ->  ratio /
    distance / rotation-consistency gates  ->  matches + validity

Hamming distance over 256-bit descriptors is computed as a single matmul:
with bits a, b in {0,1}, popcount(a XOR b) = |a| + |b| - 2 a.b — one
(Na, 256) x (256, Nb) contraction that XLA tiles onto the MXU. Full
brute-force N^2 matching replaces the reference's BoW-node blocking
(SearchByBoW): at N <= 2048 the matmul is microseconds on TPU and strictly
higher recall (SURVEY §7.1).

Constants TH_LOW=50, TH_HIGH=100, HISTO_LENGTH=30 follow
†include/ORBmatcher.h ≈L40-45.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .orb import unpack_bits

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
INVALID = jnp.iinfo(jnp.int32).max // 2  # sentinel distance


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 32) u8, (Nb, 32) u8 -> (Na, Nb) int32 Hamming distances.

    Replaces †ORBmatcher::DescriptorDistance's per-pair popcount bit-hack with
    one MXU contraction.
    """
    a = unpack_bits(desc_a).astype(jnp.float32)  # (Na, 256) in {0,1}
    b = unpack_bits(desc_b).astype(jnp.float32)
    # Explicit DEFAULT precision keeps this contraction on the fast bf16 MXU
    # path despite the package-wide float32 policy (see orbslam2_tpu.__init__):
    # {0,1} operands are exact in bf16 and XLA accumulates in f32.
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    na = jnp.sum(a, axis=1, keepdims=True)
    nb = jnp.sum(b, axis=1, keepdims=True)
    d = na + nb.T - 2.0 * dot
    return jnp.round(d).astype(jnp.int32)


class MatchResult(NamedTuple):
    """Per-row (A-side) match into B."""

    idx: jnp.ndarray    # (Na,) int32 index into B, -1 if unmatched
    dist: jnp.ndarray   # (Na,) int32 Hamming distance (INVALID if unmatched)
    valid: jnp.ndarray  # (Na,) bool


def masked_top2(
    dist: jnp.ndarray, pair_mask: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best and second-best distance per row under a pair mask.

    Returns (best_idx, best_dist, second_dist, second_idx); masked-out pairs
    get INVALID distances.
    """
    if pair_mask is not None:
        dist = jnp.where(pair_mask, dist, INVALID)
    best_idx = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    masked = dist.at[jnp.arange(dist.shape[0]), best_idx].set(INVALID)
    second_idx = jnp.argmin(masked, axis=1)
    second = jnp.take_along_axis(masked, second_idx[:, None], axis=1)[:, 0]
    return best_idx.astype(jnp.int32), best, second, second_idx.astype(jnp.int32)


def rotation_consistency_mask(
    angle_a: jnp.ndarray,
    angle_b_matched: jnp.ndarray,
    match_valid: jnp.ndarray,
    n_keep: int = 3,
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the top-`n_keep`
    bins of a HISTO_LENGTH-bin rotation histogram (†ComputeThreeMaxima).

    Args: per-A angles (radians), matched-B angles gathered per A, validity.
    Returns a bool mask over A.
    """
    two_pi = 2.0 * jnp.pi
    diff = jnp.mod(angle_a - angle_b_matched, two_pi)  # [0, 2pi)
    bins = jnp.clip(
        (diff * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1
    )
    counts = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(
        match_valid.astype(jnp.int32)
    )
    # Reference keeps bins 2 and 3 only if within 10% of the max count.
    top_vals, top_idx = jax.lax.top_k(counts, n_keep)
    keep_bin = jnp.zeros((HISTO_LENGTH,), bool)
    keep = top_vals >= jnp.maximum((0.1 * top_vals[0]).astype(jnp.int32), 1)
    keep_bin = keep_bin.at[top_idx].set(keep)
    return match_valid & keep_bin[bins]


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    pair_mask: Optional[jnp.ndarray] = None,
    max_dist: int = TH_LOW,
    nn_ratio: float = 1.0,
    angles_a: Optional[jnp.ndarray] = None,
    angles_b: Optional[jnp.ndarray] = None,
    check_rotation: bool = False,
    mutual: bool = False,
    octave_b: Optional[jnp.ndarray] = None,
    ratio_same_level_only: bool = False,
) -> MatchResult:
    """The parameterized matcher all SearchBy* variants reduce to.

    Args:
      desc_a/desc_b: packed (N, 32) uint8 descriptors.
      valid_a/valid_b: bool masks of live rows.
      pair_mask: optional (Na, Nb) bool of geometrically admissible pairs.
      max_dist: Hamming gate (TH_LOW or TH_HIGH depending on call site).
      nn_ratio: best < ratio * second-best gate (1.0 disables).
      check_rotation: apply the 30-bin rotation-consistency filter.
      mutual: require A->B and B->A agreement (used by symmetric searches).
      octave_b / ratio_same_level_only: apply the ratio gate only when the
        two best candidates sit on the same pyramid level — the projection
        tracker's semantics (†SearchByProjection(Frame, vector<MapPoint*>):
        "if(bestLevel==bestLevel2 && bestDist>mfNNratio*bestDist2) continue").
    """
    dist = hamming_matrix(desc_a, desc_b)
    base = valid_a[:, None] & valid_b[None, :]
    mask = base if pair_mask is None else (base & pair_mask)
    best_idx, best, second, second_idx = masked_top2(dist, mask)

    ok = (best <= max_dist) & valid_a
    if nn_ratio < 1.0:
        ratio_ok = best.astype(jnp.float32) < nn_ratio * second.astype(
            jnp.float32
        )
        if ratio_same_level_only and octave_b is not None:
            same_lvl = octave_b[best_idx] == octave_b[second_idx]
            ratio_ok = ratio_ok | ~same_lvl
        ok = ok & ratio_ok
    if mutual:
        bbest_idx, bbest, _, _ = masked_top2(dist.T, mask.T)
        ok = ok & (bbest_idx[best_idx] == jnp.arange(desc_a.shape[0]))
    if check_rotation and angles_a is not None and angles_b is not None:
        ang_b = angles_b[best_idx]
        ok = rotation_consistency_mask(angles_a, ang_b, ok)

    return MatchResult(
        idx=jnp.where(ok, best_idx, -1),
        dist=jnp.where(ok, best, INVALID),
        valid=ok,
    )


# ---------------------------------------------------------------------------
# Geometry gate builders (the per-call-site pair masks)
# ---------------------------------------------------------------------------

def radius_gate(
    proj_xy: jnp.ndarray,
    kp_xy: jnp.ndarray,
    radius: jnp.ndarray,
) -> jnp.ndarray:
    """(Na, 2) projected positions vs (Nb, 2) keypoints within per-A radius.

    `radius` is (Na,) (callers scale it by octave / viewing angle as the
    reference does in SearchByProjection).
    """
    d2 = jnp.sum((proj_xy[:, None, :] - kp_xy[None, :, :]) ** 2, axis=-1)
    return d2 <= (radius[:, None] ** 2)


def octave_gate(
    octave_a: jnp.ndarray, octave_b: jnp.ndarray, lo: int = 0, hi: int = 0
) -> jnp.ndarray:
    """Allow matches whose B octave is within [oct_a + lo, oct_a + hi]."""
    diff = octave_b[None, :] - octave_a[:, None]
    return (diff >= lo) & (diff <= hi)


def epipolar_gate(
    kp1_xy: jnp.ndarray,
    kp2_xy: jnp.ndarray,
    F12: jnp.ndarray,
    sigma2_level2: jnp.ndarray,
) -> jnp.ndarray:
    """Pairs whose point-to-epipolar-line distance^2 < 3.84 sigma^2 of the
    level of kp2 (†ORBmatcher::CheckDistEpipolarLine ≈L150-170)."""
    ones1 = jnp.ones((kp1_xy.shape[0], 1), kp1_xy.dtype)
    x1h = jnp.concatenate([kp1_xy, ones1], axis=1)  # (N1, 3)
    lines = x1h @ F12.T  # (N1, 3) epipolar lines in image 2
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * kp2_xy[None, :, :][..., 0] + b * kp2_xy[None, :, :][..., 1] + c
    den = a * a + b * b
    d2 = (num * num) / jnp.maximum(den, 1e-12)
    return d2 < 3.84 * sigma2_level2[None, :]


def fundamental_from_poses(
    K1: jnp.ndarray, K2: jnp.ndarray, T1w: jnp.ndarray, T2w: jnp.ndarray
) -> jnp.ndarray:
    """Fundamental matrix from two camera poses.

    Returns F21 = K2^-T [t21]x R21 K1^-1, which maps an image-1 point x1 to
    its epipolar line in image 2 (x2^T F21 x1 = 0) — the form
    `epipolar_gate` consumes (the reference builds the same matrix in
    †KeyFrame-pair triangulation, ComputeF12)."""
    from . import geometry as geo

    T21 = T2w @ geo.se3_inverse(T1w)
    R = T21[:3, :3]
    t = T21[:3, 3]
    tx = geo.hat(t)
    E = tx @ R
    K1inv = jnp.linalg.inv(K1)
    K2inv_t = jnp.linalg.inv(K2).T
    return K2inv_t @ E @ K1inv
