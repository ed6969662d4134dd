"""ctypes bindings + build driver for the native data loader.

The shared library builds on first use (g++, system zlib); every consumer
gracefully falls back to cv2 decoding when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libexavatar_loader.so")
_lib = None


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library (idempotent)."""
    src = osp.join(_DIR, "dataloader.cpp")
    if osp.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH,
             "-lz", "-lpthread"],
            check=True, capture_output=True,
        )
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.exa_loader_create.restype = ctypes.c_void_p
    lib.exa_loader_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.exa_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.exa_loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p
    ]
    lib.exa_loader_wait.restype = ctypes.c_int64
    lib.exa_loader_wait.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.exa_loader_copy.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.exa_decode_png.restype = ctypes.c_int
    lib.exa_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_png_native(path: str, max_pixels: int = 1 << 24) -> Optional[np.ndarray]:
    """Decode one PNG to CHW float32 in [0, 1] via the native decoder."""
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.empty((4 * max_pixels,), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.exa_decode_png(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if rc != 0:
        return None
    n = c.value * h.value * w.value
    return buf[:n].reshape(c.value, h.value, w.value).copy()


class NativeLoader:
    """Prefetching loader: submit paths, iterate decoded CHW float images
    in completion order (id, array)."""

    def __init__(self, num_threads: int = 8, queue_cap: int = 16):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++/zlib missing)")
        self._lib = lib
        self._h = lib.exa_loader_create(num_threads, queue_cap)

    def close(self):
        if self._h:
            self._lib.exa_loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def submit(self, idx: int, path: str):
        self._lib.exa_loader_submit(self._h, idx, path.encode())

    def wait(self) -> Tuple[int, Optional[np.ndarray]]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rid = self._lib.exa_loader_wait(
            self._h, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)
        )
        if rid < 0:
            return int(rid), None
        out = np.empty((c.value, h.value, w.value), np.float32)
        self._lib.exa_loader_copy(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return int(rid), out

    def map(self, paths: Sequence[str]) -> Dict[int, np.ndarray]:
        """Decode a batch of paths with full pipeline overlap."""
        for i, p in enumerate(paths):
            self.submit(i, p)
        out: Dict[int, np.ndarray] = {}
        for _ in paths:
            rid, arr = self.wait()
            if rid >= 0 and arr is not None:
                out[rid] = arr
        return out
