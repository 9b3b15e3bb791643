"""Image-level ops: separable Gaussian blur, bilinear resize, pyramid build.

Replaces the reference's OpenCV image plumbing (†src/ORBextractor.cc:
ComputePyramid ≈ cv::resize bilinear ×1/1.2 per level; GaussianBlur(7,7,σ=2)
before descriptor sampling). Everything is statically shaped: level sizes are
computed in Python at trace time from the config.
"""

from __future__ import annotations

from typing import List, Tuple

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


import functools


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Static (n_out, n_in) bilinear interpolation matrix with cv::resize's
    half-pixel center alignment (src = (dst + 0.5) * scale - 0.5)."""
    s = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    s = np.clip(s, 0.0, n_in - 1.0)
    i0 = np.floor(s).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = s - i0
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += (1.0 - w).astype(np.float32)
    M[np.arange(n_out), i1] += w.astype(np.float32)
    return M


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (H, W) -> out_hw as two static matmuls (TPU-native:
    gathers are slow on TPU, the MXU is not — the interpolation matrices are
    compile-time constants, so this is Ry @ img @ Cx^T)."""
    H, W = img.shape
    oh, ow = out_hw
    Ry = jnp.asarray(_resize_matrix(H, oh))
    Cx = jnp.asarray(_resize_matrix(W, ow))
    return jnp.dot(
        jnp.dot(Ry, img, preferred_element_type=jnp.float32),
        Cx.T,
        preferred_element_type=jnp.float32,
    )


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
