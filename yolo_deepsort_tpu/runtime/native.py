"""ctypes binding for the native frame-ring runtime (native/frame_ring.cpp).

Builds the shared library on first use with g++ (cached under native/build/);
falls back gracefully (callers check ``available()``) when no compiler is
present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frame_ring.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libframe_ring.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                os.makedirs(os.path.dirname(_LIB), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", _LIB],
                    check=True, capture_output=True, text=True,
                )
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None
        lib.fr_create.restype = ctypes.c_void_p
        lib.fr_create.argtypes = [ctypes.c_int] * 4
        lib.fr_destroy.argtypes = [ctypes.c_void_p]
        lib.fr_push.restype = ctypes.c_int
        lib.fr_push.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.fr_mark_finished.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fr_available.restype = ctypes.c_int
        lib.fr_available.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fr_finished.restype = ctypes.c_int
        lib.fr_finished.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fr_dropped.restype = ctypes.c_uint64
        lib.fr_dropped.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fr_pop_batch.restype = ctypes.c_int
        lib.fr_pop_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class FramePool:
    """Multi-stream SPSC frame rings with fused BGR->RGB batch assembly.

    Producers (decode threads) call ``push(stream, frame_bgr)``; the compute
    loop calls ``pop_batch()`` to gather one contiguous (S, H, W, 3) RGB
    batch. The copy/swizzle runs in C++ off the GIL."""

    def __init__(self, n_streams: int, height: int, width: int, depth: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frame_ring unavailable (no g++?)")
        self._lib = lib
        self.n_streams = n_streams
        self.shape = (height, width)
        self._pool = ctypes.c_void_p(
            lib.fr_create(n_streams, height, width, depth)
        )
        self._batch = np.empty((n_streams, height, width, 3), np.uint8)
        self._valid = np.empty((n_streams,), np.uint8)

    def push(self, stream: int, frame_bgr: np.ndarray) -> bool:
        frame_bgr = np.ascontiguousarray(frame_bgr, dtype=np.uint8)
        assert frame_bgr.shape == (*self.shape, 3), frame_bgr.shape
        ok = self._lib.fr_push(
            self._pool, stream, frame_bgr.ctypes.data_as(ctypes.c_void_p)
        )
        return bool(ok)

    def mark_finished(self, stream: int) -> None:
        self._lib.fr_mark_finished(self._pool, stream)

    def available_frames(self, stream: int) -> int:
        return self._lib.fr_available(self._pool, stream)

    def finished(self, stream: int) -> bool:
        return bool(self._lib.fr_finished(self._pool, stream))

    def dropped(self, stream: int) -> int:
        return int(self._lib.fr_dropped(self._pool, stream))

    def pop_batch(self, consume: bool = True) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (batch_rgb (S, H, W, 3), valid (S,) bool, n_valid). Invalid
        stream slots keep their previous contents (mask them downstream)."""
        n = self._lib.fr_pop_batch(
            self._pool,
            self._batch.ctypes.data_as(ctypes.c_void_p),
            self._valid.ctypes.data_as(ctypes.c_void_p),
            1 if consume else 0,
        )
        return self._batch, self._valid.astype(bool), int(n)

    def close(self) -> None:
        if self._pool:
            self._lib.fr_destroy(self._pool)
            self._pool = ctypes.c_void_p(0)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
