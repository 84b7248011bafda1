"""ctypes binding for the native prefetching frame loader (native/loader.cc).

Worker threads decode images ahead of the tracker; frames arrive in order
through a bounded queue. Falls back to synchronous cv2 decode when the
shared library has not been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libframeloader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_float]
        lib.loader_next.restype = ctypes.c_int64
        lib.loader_next.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


class PrefetchLoader:
    """In-order frame stream with background native decode."""

    def __init__(self, paths: List[str], n_threads: int = 2,
                 queue_cap: int = 8, depth_scale: float = 0.0,
                 max_pixels: int = 4096 * 4096):
        self.paths = list(paths)
        self._buf = np.empty(max_pixels, np.float32)
        lib = _load_lib()
        if lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths])
            self._h = lib.loader_create(arr, len(paths), n_threads,
                                        queue_cap, depth_scale)
            self._lib = lib
            self._i = None
        else:
            self._h = None
            self._lib = None
            self._i = 0
            self._depth_scale = depth_scale

    def next(self) -> Optional[np.ndarray]:
        """Next frame as float32 [H, W], or None at end of sequence."""
        if self._lib is not None:
            h = ctypes.c_int32()
            w = ctypes.c_int32()
            n = self._lib.loader_next(self._h, self._buf, len(self._buf),
                                      ctypes.byref(h), ctypes.byref(w))
            if n == -1:
                return None
            if n < 0:
                raise IOError(f"native loader error {n}")
            return self._buf[:n].reshape(h.value, w.value).copy()
        # fallback: synchronous cv2
        if self._i >= len(self.paths):
            return None
        import cv2
        p = self.paths[self._i]
        self._i += 1
        if self._depth_scale > 0:
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            return img.astype(np.float32) / self._depth_scale
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        return img.astype(np.float32)

    def close(self):
        if self._lib is not None and self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
