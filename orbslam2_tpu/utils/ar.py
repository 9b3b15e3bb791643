"""AR anchor demo support — the reference's ViewerAR, headless.

†Examples/ROS/ORB_SLAM2/AR/{ros_mono_ar,ViewerAR}.cc render a virtual cube
on a plane fitted to the tracked map points, drawn over the live camera
image in a Pangolin GL window. The TPU-host equivalent is numpy-side: RANSAC
plane fit over the current local map points, a cube anchored on that plane,
and a wireframe overlay rasterized straight into the gray frame (no GL).

Used by examples/ar_demo.py; the math is plain numpy — this is a viewer-side
feature and must not occupy the device hot path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def fit_plane_ransac(
    points: np.ndarray,
    iters: int = 200,
    inlier_th: float = 0.02,
    min_inliers: int = 30,
    seed: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fit a dominant plane to (N,3) points. Returns (normal, center) or
    None. Mirrors ViewerAR::DetectPlane's 50-iteration 3-point RANSAC with
    a least-squares refit over the inliers (we vectorize all hypotheses
    instead of looping — same batched-RANSAC stance as every solver here).
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < max(min_inliers, 3):
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(iters, 3))
    p0, p1, p2 = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    nrm = np.cross(p1 - p0, p2 - p0)                       # (I, 3)
    mag = np.linalg.norm(nrm, axis=1, keepdims=True)
    ok = mag[:, 0] > 1e-9
    nrm = np.where(ok[:, None], nrm / np.maximum(mag, 1e-12), 0.0)
    # distance of every point to every hypothesis plane: (I, N)
    d = np.abs((pts[None, :, :] - p0[:, None, :]) @ nrm[..., None])[..., 0]
    inl = (d < inlier_th) & ok[:, None]
    counts = inl.sum(axis=1)
    best = int(np.argmax(counts))
    if counts[best] < min_inliers:
        return None
    sel = pts[inl[best]]
    center = sel.mean(axis=0)
    # least-squares normal = smallest singular vector of the centered cloud
    _, _, vt = np.linalg.svd(sel - center, full_matrices=False)
    normal = vt[-1]
    if normal[1] > 0:  # keep the normal pointing "up" (-y is up in camera)
        normal = -normal
    return normal.astype(np.float32), center.astype(np.float32)


def cube_vertices(center: np.ndarray, normal: np.ndarray,
                  size: float = 0.1) -> np.ndarray:
    """(8,3) world vertices of a cube of edge `size` sitting ON the plane."""
    n = normal / max(np.linalg.norm(normal), 1e-12)
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(n, a)
    u /= max(np.linalg.norm(u), 1e-12)
    v = np.cross(n, u)
    h = size / 2.0
    base = center
    out = []
    for dz in (0.0, size):          # bottom face on the plane, top lifted
        for du, dv in ((-h, -h), (h, -h), (h, h), (-h, h)):
            out.append(base + du * u + dv * v + dz * n)
    return np.asarray(out, np.float32)


_CUBE_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def _draw_line(img: np.ndarray, x0, y0, x1, y1, value: int):
    """Bresenham-free vectorized line rasterization (sampled)."""
    h, w = img.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[m], xs[m]] = value


def draw_cube_overlay(img: np.ndarray, Tcw: np.ndarray, K: np.ndarray,
                      verts_w: np.ndarray, value: int = 255) -> np.ndarray:
    """Project cube vertices through the tracked pose and draw the wireframe
    into a copy of the gray image (the ViewerAR draw, sans OpenGL)."""
    out = np.array(img, copy=True)
    pc = verts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    if (pc[:, 2] <= 0.05).any():
        return out  # cube behind the camera: nothing to draw
    uv = (pc[:, :2] / pc[:, 2:3]) @ np.diag([K[0, 0], K[1, 1]]) + K[:2, 2]
    for i, j in _CUBE_EDGES:
        _draw_line(out, uv[i, 0], uv[i, 1], uv[j, 0], uv[j, 1], value)
    return out


def write_png_gray(path: str, img: np.ndarray) -> None:
    """Minimal stdlib 8-bit grayscale PNG writer (no third-party deps)."""
    import struct
    import zlib

    arr = np.asarray(img, np.uint8)
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
