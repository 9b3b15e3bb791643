"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Re-design of the reference's example-loader code (†Examples/*/
{mono_tum,mono_kitti,mono_euroc,stereo_kitti,stereo_euroc,rgbd_tum}.cc
LoadImages functions + †Examples/RGB-D/associate.py, SURVEY §2.1 row 20):
same directory layouts and file formats, returned as python iterators of
(timestamp, grayscale float32 arrays). Image IO via PIL (the only non-core
dependency; the reference links all of OpenCV for this).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


def _load_depth_png(path: str, factor: float) -> np.ndarray:
    from PIL import Image

    raw = np.asarray(Image.open(path), dtype=np.float32)
    return raw / factor


# ---------------------------------------------------------------------------
# TUM RGB-D (†rgbd_tum.cc / mono_tum.cc + associate.py)
# ---------------------------------------------------------------------------

def _read_tum_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def associate(
    a: List[Tuple[float, str]], b: List[Tuple[float, str]], max_dt: float = 0.02
) -> List[Tuple[float, str, str]]:
    """Greedy timestamp association (†Examples/RGB-D/associate.py)."""
    out = []
    j = 0
    for ta, pa in a:
        while j + 1 < len(b) and abs(b[j + 1][0] - ta) < abs(b[j][0] - ta):
            j += 1
        if j < len(b) and abs(b[j][0] - ta) <= max_dt:
            out.append((ta, pa, b[j][1]))
    return out


def tum_rgbd_sequence(
    root: str, depth_factor: float = 5000.0
) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    """Yields (timestamp, gray, depth_m) from a TUM fr*/ directory."""
    rgb = _read_tum_list(os.path.join(root, "rgb.txt"))
    depth = _read_tum_list(os.path.join(root, "depth.txt"))
    for ts, prgb, pdepth in associate(rgb, depth):
        yield ts, _load_gray(os.path.join(root, prgb)), _load_depth_png(
            os.path.join(root, pdepth), depth_factor
        )


def tum_mono_sequence(root: str) -> Iterator[Tuple[float, np.ndarray]]:
    for ts, p in _read_tum_list(os.path.join(root, "rgb.txt")):
        yield ts, _load_gray(os.path.join(root, p))


# ---------------------------------------------------------------------------
# KITTI odometry (†mono_kitti.cc / stereo_kitti.cc)
# ---------------------------------------------------------------------------

def kitti_sequence(
    root: str, stereo: bool = False
) -> Iterator[Tuple[float, np.ndarray, Optional[np.ndarray]]]:
    """Yields (timestamp, left, right?) from a KITTI sequence dir
    (image_0/ image_1/ times.txt)."""
    with open(os.path.join(root, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    left_dir = os.path.join(root, "image_0")
    right_dir = os.path.join(root, "image_1")
    for i, ts in enumerate(times):
        name = f"{i:06d}.png"
        left = _load_gray(os.path.join(left_dir, name))
        right = _load_gray(os.path.join(right_dir, name)) if stereo else None
        yield ts, left, right


# ---------------------------------------------------------------------------
# EuRoC MAV (†mono_euroc.cc / stereo_euroc.cc)
# ---------------------------------------------------------------------------

def euroc_sequence(
    root: str, stereo: bool = False
) -> Iterator[Tuple[float, np.ndarray, Optional[np.ndarray]]]:
    """Yields (timestamp_s, cam0, cam1?) from mav0/ layout."""
    cam0 = os.path.join(root, "mav0", "cam0", "data")
    cam1 = os.path.join(root, "mav0", "cam1", "data")
    names = sorted(os.listdir(cam0))
    for name in names:
        if not name.endswith(".png"):
            continue
        ts = float(name[:-4]) * 1e-9
        left = _load_gray(os.path.join(cam0, name))
        right = (
            _load_gray(os.path.join(cam1, name))
            if stereo and os.path.exists(os.path.join(cam1, name))
            else None
        )
        yield ts, left, right
