"""TPU-native ORB feature extraction: FAST-9/16 + oriented BRIEF.

Re-design of the reference ORBextractor (†src/ORBextractor.cc, SURVEY §2.4)
with zero data-dependent control flow:

  - 8-level pyramid, ×1.2 (shared with reference).
  - FAST-9/16 corner *score map* computed branch-free: the segment test
    becomes a circular windowed min over the 16 ring differences (4 min ops
    via doubling), score = OpenCV's corner measure (the max threshold at
    which the pixel stays a corner).
  - Dual threshold (iniThFAST=20 / minThFAST=7) realized per selection cell:
    cells that fire at 20 use the high threshold, others fall back to 7 —
    same intent as the reference's per-cell retry, one pass.
  - Quadtree spatial balancing (†DistributeOctTree) replaced by per-cell
    round-robin top-k: rank-r-within-cell beats rank-r+1 anywhere, ties by
    response. Documented behavioral deviation (SURVEY §7.3.3), validated by
    trajectory accuracy tests.
  - Intensity-centroid orientation over the radius-15 circular patch
    (†IC_Angle), and steered BRIEF over a 7x7 σ=2 Gaussian-blurred level
    image (†computeOrbDescriptor). The 256-pair pattern is generated
    deterministically (seeded Gaussian, BRIEF-G-II style) instead of copying
    the learned table — descriptors only need internal consistency here.

Everything returns fixed-capacity arrays with validity masks.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import image as img_ops
from ..config import ExtractorConfig

# Radius-3 Bresenham circle, 16 offsets in ring order (row, col).
FAST_RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

PATCH_R = 20          # patch radius for orientation/descriptor sampling
PATCH = 2 * PATCH_R + 1  # 41
IC_R = 15             # intensity-centroid radius (reference HALF_PATCH_SIZE)
CELL = 32             # selection cell size in pixels (quadtree replacement)
TOPK_PER_CELL = 8     # candidates kept per cell before global round-robin


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (the reference's keypoint vectors).

    All arrays have leading dim N = max_keypoints; `valid` masks real entries.
    `xy` is in level-0 (full-resolution) pixel coordinates, like the
    reference's scaled-back keypoints (†ORBextractor operator() exit).
    """

    xy: jnp.ndarray        # (N, 2) float32, level-0 coords
    response: jnp.ndarray  # (N,) float32 FAST corner measure
    angle: jnp.ndarray     # (N,) float32 radians
    octave: jnp.ndarray    # (N,) int32 pyramid level
    desc: jnp.ndarray      # (N, 32) uint8 packed 256-bit rBRIEF
    valid: jnp.ndarray     # (N,) bool

    @property
    def n(self):
        return self.xy.shape[0]


# ---------------------------------------------------------------------------
# FAST score map
# ---------------------------------------------------------------------------

def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Branch-free FAST-9/16 corner measure for every pixel of (H, W).

    Returns S with S[y,x] = max over polarity of (max over the 16 nine-long
    arcs of the min ring difference) — i.e. the largest threshold t for which
    the segment test still passes. Non-corners get values <= 0.
    """
    d = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in FAST_RING]
    ) - img[None]

    def arc_min9(x):
        y = jnp.minimum(x, jnp.roll(x, -1, axis=0))
        y = jnp.minimum(y, jnp.roll(y, -2, axis=0))
        y = jnp.minimum(y, jnp.roll(y, -4, axis=0))      # windows of 8
        return jnp.minimum(y, jnp.roll(x, -8, axis=0))   # extend to 9

    bright = jnp.max(arc_min9(d), axis=0)
    dark = jnp.max(arc_min9(-d), axis=0)
    return jnp.maximum(bright, dark)


def _maxpool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k max pool, stride 1, same padding (via -inf)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )


def _cell_reduce_max(x: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Max over non-overlapping cell x cell tiles -> (H/cell, W/cell)."""
    H, W = x.shape
    return jnp.max(x.reshape(H // cell, cell, W // cell, cell), axis=(1, 3))


def detect_level(
    img: jnp.ndarray,
    n_out: int,
    ini_th: float,
    min_th: float,
    border: int = PATCH_R,
):
    """Detect up to n_out FAST keypoints on one pyramid level.

    Returns (xy_int (n_out, 2) int32 level coords, xy_sub (n_out, 2) float32
    subpixel level coords, response (n_out,), valid).
    """
    H, W = img.shape
    S_raw = fast_score_map(img)
    # Exclude the border band (keeps all later patch reads in-bounds).
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    S = jnp.where(in_border, S_raw, -1.0)

    # 3x3 non-max suppression on the score map.
    nms = S >= _maxpool2d(S, 3)
    S = jnp.where(nms, S, -1.0)

    # Pad to cell multiples.
    Hp = ((H + CELL - 1) // CELL) * CELL
    Wp = ((W + CELL - 1) // CELL) * CELL
    Sp = jnp.full((Hp, Wp), -1.0, dtype=S.dtype)
    Sp = Sp.at[:H, :W].set(S)
    Hc, Wc = Hp // CELL, Wp // CELL

    # Dual threshold per cell: high threshold where it fires, low elsewhere.
    cell_max = _cell_reduce_max(Sp, CELL)                    # (Hc, Wc)
    cell_th = jnp.where(cell_max > ini_th, ini_th, min_th)   # (Hc, Wc)
    th_full = jnp.repeat(jnp.repeat(cell_th, CELL, axis=0), CELL, axis=1)
    Sp = jnp.where(Sp > th_full, Sp, -1.0)

    # Per-cell top-k, unrolled as K rounds of (max, mask) — lax.top_k on a
    # (cells, 1024) matrix is ~1.4 ms/level on TPU; this form is pure VPU.
    cells = Sp.reshape(Hc, CELL, Wc, CELL).transpose(0, 2, 1, 3).reshape(
        Hc * Wc, CELL * CELL
    )
    vals_l, idx_l = [], []
    work = cells
    for _ in range(TOPK_PER_CELL):
        i = jnp.argmax(work, axis=1)
        v = jnp.take_along_axis(work, i[:, None], axis=1)[:, 0]
        vals_l.append(v)
        idx_l.append(i)
        work = work.at[jnp.arange(work.shape[0]), i].set(-jnp.inf)
    vals = jnp.stack(vals_l, axis=1)                          # (C, K)
    idx = jnp.stack(idx_l, axis=1)

    # Round-robin priority: rank within cell dominates, then response.
    rank = jnp.arange(TOPK_PER_CELL, dtype=jnp.float32)[None, :]
    key = jnp.where(vals > 0, rank * 4096.0 - vals, jnp.inf)
    flat_key = key.reshape(-1)
    sel = jnp.argsort(flat_key)[:n_out]
    sel_valid = flat_key[sel] < 1e9

    cell_id = sel // TOPK_PER_CELL
    within = idx.reshape(-1)[sel]
    cy = (cell_id // Wc) * CELL + within // CELL
    cx = (cell_id % Wc) * CELL + within % CELL
    xy = jnp.stack([cx, cy], axis=-1).astype(jnp.int32)
    resp = vals.reshape(-1)[sel]

    # Subpixel refinement: 1D parabola per axis on the raw score map (the
    # 3x3 NMS guarantees the center dominates its neighbors, so the fitted
    # offset stays in [-0.5, 0.5]). Integer coords quantize to a full pixel
    # at the coarse pyramid levels once scaled back to level 0 — measured
    # recall/accuracy lever (VERDICT round-1 item 1).
    cyc = jnp.clip(cy, 1, H - 2)
    cxc = jnp.clip(cx, 1, W - 2)
    Sf = S_raw.reshape(-1)

    def at(dy, dx):
        return Sf[(cyc + dy) * W + (cxc + dx)]

    c0 = at(0, 0)
    dxo = _parabola(at(0, -1), c0, at(0, 1))
    dyo = _parabola(at(-1, 0), c0, at(1, 0))
    xy_sub = xy.astype(jnp.float32) + jnp.stack([dxo, dyo], axis=-1)
    return xy, xy_sub, jnp.where(sel_valid, resp, 0.0), sel_valid


def _parabola(l, c, r):
    """Vertex offset of the parabola through (-1,l),(0,c),(1,r), clamped."""
    den = 2.0 * c - l - r
    off = jnp.where(den > 1e-6, 0.5 * (r - l) / jnp.maximum(den, 1e-6), 0.0)
    return jnp.clip(off, -0.5, 0.5)


# ---------------------------------------------------------------------------
# Orientation + descriptor
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _ic_weight_tables() -> Tuple[np.ndarray, np.ndarray]:
    """(PATCH, PATCH) x/y moment weights over the radius-15 circular patch.

    Uses the same per-row horizontal extent as the reference's umax table
    (†ORBextractor ctor: umax[v] = round(sqrt(15^2 - v^2)))."""
    dy = np.arange(-PATCH_R, PATCH_R + 1)[:, None]
    dx = np.arange(-PATCH_R, PATCH_R + 1)[None, :]
    umax = np.round(np.sqrt(np.maximum(IC_R * IC_R - dy * dy, 0.0)))
    mask = (np.abs(dy) <= IC_R) & (np.abs(dx) <= umax)
    return (dx * mask).astype(np.float32), (dy * mask).astype(np.float32)


@functools.lru_cache()
def _brief_pattern(seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """256 test pairs for steered BRIEF, each point in the 31x31 patch.

    Default: the decorrelated pattern learned by tools/train_brief_pattern.py
    (the rBRIEF greedy procedure re-run on our own synthetic patches — the
    reference's learned bit_pattern_31_ table is deliberately NOT copied).
    Falls back to seeded-Gaussian BRIEF-G-II sampling if the asset is absent
    or SLAM_BRIEF_PATTERN=random.
    """
    import os

    asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                         "brief_pattern.npz")
    if os.environ.get("SLAM_BRIEF_PATTERN", "") != "random" and \
            os.path.exists(asset):
        data = np.load(asset)
        return data["pa"].astype(np.int32), data["pb"].astype(np.int32)
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 31.0 / 5.0, size=(256, 2, 2))
    pts = np.clip(np.round(pts), -13, 13).astype(np.int32)
    # Avoid degenerate pairs (identical points => constant bits).
    same = np.all(pts[:, 0] == pts[:, 1], axis=-1)
    pts[same, 1, 0] = np.clip(pts[same, 1, 0] + 1, -13, 13)
    return pts[:, 0], pts[:, 1]  # each (256, 2) as (x, y)


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, PATCH, PATCH) patches centered at integer coords (N, 2)."""
    H, W = img.shape
    offs = jnp.arange(-PATCH_R, PATCH_R + 1)
    rows = jnp.clip(xy[:, 1, None] + offs[None, :], 0, H - 1)  # (N, P)
    cols = jnp.clip(xy[:, 0, None] + offs[None, :], 0, W - 1)  # (N, P)
    return img[rows[:, :, None], cols[:, None, :]]             # (N, P, P)


def ic_angles(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch: atan2(m01, m10) (†IC_Angle)."""
    wx, wy = _ic_weight_tables()
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(wx))
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(wy))
    return jnp.arctan2(m01, m10)


def brief_descriptors(
    patches_blur: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF: rotate the pattern by each keypoint angle, sample the
    blurred patch, compare, pack into (N, 32) uint8.

    Matches †computeOrbDescriptor's integer rounding of rotated offsets.
    """
    pa, pb = _brief_pattern()
    px = jnp.asarray(np.concatenate([pa[:, 0], pb[:, 0]]), jnp.float32)  # (512,)
    py = jnp.asarray(np.concatenate([pa[:, 1], pb[:, 1]]), jnp.float32)
    c = jnp.cos(angles)[:, None]
    s = jnp.sin(angles)[:, None]
    # Reference: col offset = round(x cos - y sin), row offset = round(x sin + y cos)
    rc = jnp.round(px[None] * c - py[None] * s).astype(jnp.int32) + PATCH_R
    rr = jnp.round(px[None] * s + py[None] * c).astype(jnp.int32) + PATCH_R
    rc = jnp.clip(rc, 0, PATCH - 1)
    rr = jnp.clip(rr, 0, PATCH - 1)
    flat = patches_blur.reshape(patches_blur.shape[0], -1)  # (N, P*P)
    vals = jnp.take_along_axis(flat, rr * PATCH + rc, axis=1)  # (N, 512)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint8)   # (N, 256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.einsum(
        "nkb,b->nk", bits.reshape(-1, 32, 8).astype(jnp.uint32),
        weights.astype(jnp.uint32),
    ).astype(jnp.uint8)


def _ic_moment_maps(img: jnp.ndarray):
    """Whole-image IC moment maps m10, m01 via row prefix sums.

    The circular-patch moments are per-row horizontal ramp/box sums, so with
    prefix sums along x each row of the circle costs O(1) per pixel:
      sum_{|dx|<=u} I(y+dy, x+dx)      = P[y+dy, x+u+1] - P[y+dy, x-u]
      sum_{|dx|<=u} dx I(y+dy, x+dx)   = (QJ - x * P) differences
    31 unrolled dy rows of cheap shifted adds — no conv, no gathers; exact
    match to the patch-based †IC_Angle computation.
    """
    H, W = img.shape
    pad = IC_R + 1
    zero_col = jnp.zeros((H, 1), img.dtype)
    P = jnp.concatenate([zero_col, jnp.cumsum(img, axis=1)], axis=1)  # (H, W+1)
    j = jnp.arange(W, dtype=img.dtype)[None, :]
    QJ = jnp.concatenate([zero_col, jnp.cumsum(img * j, axis=1)], axis=1)
    # pad so x-u and x+u+1 lookups stay in range (border rows are garbage,
    # but keypoints live >= PATCH_R from the border)
    Pp = jnp.pad(P, ((0, 0), (pad, pad)))
    QJp = jnp.pad(QJ, ((0, 0), (pad, pad)))
    xcol = jnp.arange(W, dtype=img.dtype)[None, :]

    dy_vals = np.arange(-IC_R, IC_R + 1)
    umax = np.round(np.sqrt(np.maximum(IC_R * IC_R - dy_vals * dy_vals, 0.0))).astype(int)
    m10 = jnp.zeros((H, W), img.dtype)
    m01 = jnp.zeros((H, W), img.dtype)
    for dy, u in zip(dy_vals, umax):
        # slice so column x reads index (x + u + 1) and (x - u) of P
        hiP = Pp[:, pad + u + 1 : pad + u + 1 + W]
        loP = Pp[:, pad - u : pad - u + W]
        hiQ = QJp[:, pad + u + 1 : pad + u + 1 + W]
        loQ = QJp[:, pad - u : pad - u + W]
        sI = hiP - loP
        sJI = hiQ - loQ
        row_m10 = sJI - xcol * sI
        if dy != 0:
            row_m10 = jnp.roll(row_m10, -dy, axis=0)
            sI_r = jnp.roll(sI, -dy, axis=0)
        else:
            sI_r = sI
        m10 = m10 + row_m10
        m01 = m01 + float(dy) * sI_r
    return m10, m01


def ic_angles_conv(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """TPU-fast IC angles: whole-level prefix-sum moment maps + a 2-scalar
    gather per keypoint (gathers of big patches are the slow path on TPU)."""
    H, W = img.shape
    m10, m01 = _ic_moment_maps(img)
    flat_idx = xy[:, 1] * W + xy[:, 0]
    return jnp.arctan2(
        jnp.take(m01.reshape(-1), flat_idx), jnp.take(m10.reshape(-1), flat_idx)
    )


def brief_descriptors_flat(
    blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF sampling directly from the blurred level image by flat
    index (512 samples/keypoint) — no 41x41 patch materialization.

    Requires keypoints >= PATCH_R from the border (detect_level guarantees
    this), since rotated offsets stay within radius 13*sqrt(2) < PATCH_R.
    """
    H, W = blurred.shape
    pa, pb = _brief_pattern()
    px = jnp.asarray(np.concatenate([pa[:, 0], pb[:, 0]]), jnp.float32)
    py = jnp.asarray(np.concatenate([pa[:, 1], pb[:, 1]]), jnp.float32)
    c = jnp.cos(angles)[:, None]
    s = jnp.sin(angles)[:, None]
    rc = jnp.round(px[None] * c - py[None] * s).astype(jnp.int32)
    rr = jnp.round(px[None] * s + py[None] * c).astype(jnp.int32)
    yy = jnp.clip(xy[:, 1:2] + rr, 0, H - 1)
    xx = jnp.clip(xy[:, 0:1] + rc, 0, W - 1)
    vals = jnp.take(blurred.reshape(-1), yy * W + xx)  # (N, 512)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint32)
    return jnp.einsum(
        "nkb,b->nk", bits.reshape(-1, 32, 8), weights
    ).astype(jnp.uint8)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 256) {0,1} uint8 (LSB-first per byte)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(desc.shape[:-1] + (256,))


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Geometric per-level keypoint budgets (†ORBextractor ctor ≈L420-450)."""
    factor = 1.0 / scale_factor
    n_per = n_features * (1 - factor) / (1 - factor ** n_levels)
    budgets = []
    acc = 0
    for lvl in range(n_levels - 1):
        b = int(round(n_per * factor ** lvl))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return budgets


class OrbExtractor:
    """Jitted whole-frame ORB extraction for a fixed image size.

    One instance per (image size, config); call with a (H, W) float32
    grayscale image in [0, 255] and get a `Features` pytree back.
    """

    def __init__(self, cfg: ExtractorConfig, height: int, width: int):
        self.cfg = cfg
        self.height, self.width = height, width
        self.shapes = img_ops.pyramid_shapes(height, width, cfg.n_levels, cfg.scale_factor)
        self.budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        self.n_total = sum(self.budgets)
        self.n_pad = cfg.max_keypoints
        assert self.n_pad >= self.n_total, (self.n_pad, self.n_total)
        self._extract = jax.jit(self._build)

    def _build(self, img: jnp.ndarray) -> Features:
        cfg = self.cfg
        levels = img_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        out_xy, out_resp, out_ang, out_oct, out_desc, out_valid = ([] for _ in range(6))
        for lvl, (level_img, n_l) in enumerate(zip(levels, self.budgets)):
            if n_l <= 0:
                continue
            xy_i, xy_sub, resp, valid = detect_level(
                level_img, n_l, float(cfg.ini_th_fast), float(cfg.min_th_fast)
            )
            ang = ic_angles_conv(level_img, xy_i)
            blurred = img_ops.gaussian_blur(level_img)
            desc_ang = jnp.zeros_like(ang) if cfg.upright else ang
            desc = brief_descriptors_flat(blurred, xy_i, desc_ang)
            scale = cfg.scale_factor ** lvl
            out_xy.append(xy_sub * scale)
            out_resp.append(resp)
            out_ang.append(ang)
            out_oct.append(jnp.full((n_l,), lvl, jnp.int32))
            out_desc.append(desc)
            out_valid.append(valid)

        xy = jnp.concatenate(out_xy)
        pad = self.n_pad - self.n_total

        def padn(x, fill=0):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        return Features(
            xy=padn(xy),
            response=padn(jnp.concatenate(out_resp)),
            angle=padn(jnp.concatenate(out_ang)),
            octave=padn(jnp.concatenate(out_oct)),
            desc=padn(jnp.concatenate(out_desc)),
            valid=padn(jnp.concatenate(out_valid), fill=False),
        )

    def __call__(self, img) -> Features:
        return self._extract(jnp.asarray(img, jnp.float32))
