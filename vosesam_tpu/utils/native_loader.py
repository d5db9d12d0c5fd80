"""ctypes wrapper around the native async JPEG prefetch loader.

The C++ pipeline (native/loader.cpp) decodes frames ahead of the device step
on a thread pool with a bounded in-order queue — replacing the reference's
synchronous per-frame PIL/cv2 reads on the Python thread
(tools/video_loading.py:6-20). Auto-builds with g++ on first use; falls back
to a synchronous PIL iterator when the toolchain or libjpeg is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvosloader.so")
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.loader_release.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_built() is not None


class AsyncFrameLoader:
    """In-order prefetching frame iterator over JPEG paths."""

    def __init__(self, paths: Sequence[str], threads: int = 4, depth: int = 8):
        self.paths = list(paths)
        self._lib = _ensure_built()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.loader_create(
                arr, len(self.paths), threads, depth
            )

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._handle is None:
            from PIL import Image

            for p in self.paths:
                yield np.array(Image.open(p).convert("RGB"))
            return
        lib = self._lib
        data = ctypes.POINTER(ctypes.c_ubyte)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        idx = ctypes.c_int()
        while True:
            rc = lib.loader_next(
                self._handle, ctypes.byref(data), ctypes.byref(w),
                ctypes.byref(h), ctypes.byref(idx),
            )
            if rc == 1:
                break
            if rc < 0:
                raise IOError(f"failed to decode {self.paths[idx.value]}")
            n = w.value * h.value * 3
            buf = np.ctypeslib.as_array(data, shape=(n,))
            frame = buf.reshape(h.value, w.value, 3).copy()
            lib.loader_release(data)
            yield frame

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_frames(paths: Sequence[str], threads: int = 4, depth: int = 8) -> List[np.ndarray]:
    """Eager convenience: decode all frames with the async pipeline."""
    loader = AsyncFrameLoader(paths, threads, depth)
    try:
        return list(loader)
    finally:
        loader.close()
