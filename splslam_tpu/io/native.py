"""ctypes bindings for the native C++ dataset prefetcher.

The compute path is XLA; the host runtime around it is native where the
reference's is (SURVEY: the reference is C++ end to end). Disk reads and
PNG/PGM decode run on a C++ pthread pool with a lookahead ring buffer
(native/dataloader.cpp), overlapping I/O with device compute. Falls back
to cv2 if the shared library is absent and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_native_dir(), "libsplloader.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dl_get.restype = ctypes.c_int
    lib.dl_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.dl_close.restype = None
    lib.dl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class PrefetchLoader:
    """Asynchronous grayscale image loader with native decode.

    Usage:
        with PrefetchLoader(paths, w, h) as dl:
            for i in range(len(paths)):
                img = dl[i]          # uint8 [h, w]; i+1.. already decoding
    """

    def __init__(self, paths: list[str], width: int, height: int,
                 lookahead: int = 4, n_threads: int = 2):
        self.paths = list(paths)
        self.width = width
        self.height = height
        self._lib = _load_lib()
        self._h = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in self.paths]
            )
            self._h = self._lib.dl_open(
                arr, len(paths), width, height, lookahead, n_threads
            )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._h is not None:
            out = np.empty((self.height, self.width), np.uint8)
            rc = self._lib.dl_get(
                self._h, idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            )
            if rc >= 0:
                return out
            # rc < 0: decode failure -> python fallback below
        from splslam_tpu.io.datasets import imread_gray

        img = imread_gray(self.paths[idx])
        if img.shape != (self.height, self.width):
            out = np.zeros((self.height, self.width), np.uint8)
            h = min(self.height, img.shape[0])
            w = min(self.width, img.shape[1])
            out[:h, :w] = img[:h, :w]
            return out
        return img

    def close(self):
        if self._h is not None and self._lib is not None:
            self._lib.dl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
