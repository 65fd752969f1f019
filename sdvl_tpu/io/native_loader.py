"""ctypes bindings for the native prefetching frame loader.

The C++ component (native/frame_loader.cc) replaces the reference's
VideoSource (video_source.cc:46-81): a worker pool decodes PNG/JPEG/PGM
frames ahead of the consumer into a bounded ring, hiding host decode latency
behind device compute. Falls back to a cv2-based generator when the shared
library isn't built (``make -C native``); :func:`ensure_built` compiles it
on demand with the in-image toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsdvl_native.so"))

_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if missing. Returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=quiet,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float)]
    lib.loader_remaining.restype = ctypes.c_long
    lib.loader_remaining.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return True


class NativeFrameLoader:
    """Iterate float32 grayscale frames with background prefetch."""

    def __init__(self, paths: List[str], width: int, height: int,
                 prefetch_depth: int = 8, n_threads: int = 2):
        if not ensure_built():
            raise RuntimeError("native loader unavailable (build failed)")
        self.width, self.height = width, height
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._paths_keepalive = arr
        self._handle = _lib.loader_create(
            arr, len(paths), width, height, prefetch_depth, n_threads
        )
        self._buf = np.empty((height, width), np.float32)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        _, frame = self.next_indexed()
        return frame

    def next_indexed(self):
        """(path_index, frame) of the next decodable image. Every
        loader_next call consumes exactly one path in order (rc -1 = that
        path failed to decode), so the index is a plain counter — callers
        pairing frames with per-path metadata (timestamps) stay aligned
        across skips."""
        while True:
            rc = _lib.loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc == 0:
                raise StopIteration
            self._idx = getattr(self, "_idx", -1) + 1
            if rc == 1:
                return self._idx, self._buf.copy()
            # rc == -1: undecodable frame — skip like the reference skips
            # empty reads (video_source.cc:64-79 just moves on)

    def close(self):
        if self._handle:
            _lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def frame_source(paths: List[str], width: int, height: int,
                 prefer_native: bool = True,
                 indexed: bool = False) -> Iterator:
    """Best-available frame iterator: native prefetching loader, else cv2.

    With ``indexed``, yields ``(path_index, frame)`` so per-path metadata
    (dataset timestamps) stays aligned when undecodable images are skipped.
    """
    if prefer_native and ensure_built():
        loader = NativeFrameLoader(paths, width, height)
        if indexed:
            def _native_indexed():
                while True:
                    try:
                        yield loader.next_indexed()
                    except StopIteration:
                        return
            return _native_indexed()
        return iter(loader)

    def _gen():
        import cv2

        for i, p in enumerate(paths):
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            f = img.astype(np.float32)
            yield (i, f) if indexed else f

    return _gen()
