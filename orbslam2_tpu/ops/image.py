"""Image-level ops: separable Gaussian blur, bilinear resize, pyramid build.

Replaces the reference's OpenCV image plumbing (†src/ORBextractor.cc:
ComputePyramid ≈ cv::resize bilinear ×1/1.2 per level; GaussianBlur(7,7,σ=2)
before descriptor sampling). Everything is statically shaped: level sizes are
computed in Python at trace time from the config.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image with reflect padding.

    Implemented as two passes of shifted-add (XLA fuses these into a single
    vectorized loop; avoids conv layout overhead for single-channel images).
    """
    k = gaussian_kernel1d(ksize, sigma)
    r = ksize // 2

    def pass_along(x, axis):
        xp = jnp.pad(x, [(r, r) if a == axis else (0, 0) for a in range(2)],
                     mode="reflect")
        out = jnp.zeros_like(x)
        for i in range(ksize):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return pass_along(pass_along(img, 0), 1)


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (H, W) -> out_hw, matching cv::resize's half-pixel
    center alignment (src = (dst + 0.5) * scale - 0.5)."""
    H, W = img.shape
    oh, ow = out_hw
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (H / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (W / ow) - 0.5
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    Ia = img[y0][:, x0]
    Ib = img[y0][:, x1]
    Ic = img[y1][:, x0]
    Id = img[y1][:, x1]
    top = Ia * (1 - wx) + Ib * wx
    bot = Ic * (1 - wx) + Id * wx
    return top * (1 - wy) + bot * wy


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    """Static per-level (H, W), same rounding as the reference ctor."""
    shapes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor ** lvl)
        shapes.append((int(round(h * inv)), int(round(w * inv))))
    return shapes


def build_pyramid(
    img: jnp.ndarray, n_levels: int, scale_factor: float
) -> List[jnp.ndarray]:
    """List of per-level images; level 0 is the input (float32 0..255)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        # Resize from the previous level (like the reference) to keep cost low
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels
