"""ctypes binding for the native C++ data loader (native/dataloader.cc).

The runtime around the TPU compute path is native where the reference's was
(OpenCV imread + pthreads): PNG decode (gray8/gray16/rgb) and a prefetching
worker pool live in liborbslam_native.so. Falls back to PIL transparently if
the library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "liborbslam_native.so",
)
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dl_load_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dl_load_image.restype = ctypes.c_int
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dl_get.restype = ctypes.c_int
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_image(path: str, max_pixels: int = 4096 * 3072) -> np.ndarray:
    """Decode a PNG to float32 grayscale (8-bit: 0..255; 16-bit: raw value).

    Uses the native decoder when built, else PIL.
    """
    lib = _load_lib()
    if lib is None:
        from PIL import Image

        im = Image.open(path)
        if im.mode in ("I;16", "I"):
            return np.asarray(im, dtype=np.float32)
        return np.asarray(im.convert("L"), dtype=np.float32)
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.dl_load_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """Background-decoded image sequence (the reference's real-time loop
    reads synchronously; we hide IO latency behind worker threads)."""

    def __init__(self, paths: List[str], n_workers: int = 2, window: int = 8,
                 max_pixels: int = 4096 * 3072):
        self.paths = list(paths)
        self.max_pixels = max_pixels
        lib = _load_lib()
        self._lib = lib
        self._handle = None
        if lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = lib.dl_create(arr, len(self.paths), n_workers, window)

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> np.ndarray:
        if self._handle is None:
            return load_image(self.paths[idx], self.max_pixels)
        buf = np.empty(self.max_pixels, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.dl_get(
            self._handle, idx,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.max_pixels, ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            raise IOError(f"native prefetch decode failed ({rc}) @ {idx}")
        return buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle is not None:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
