"""ctypes bindings for the native runtime components.

Currently: the parallel .npy feature loader (npy_loader.cpp).  The shared
library is compiled on first use with g++ (cached next to the source, keyed
by source mtime) and every call degrades gracefully to the NumPy path when
the toolchain or a file format is unsupported.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "npy_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_npy_loader.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.hual_load_npy_batch.restype = ctypes.c_int64
            lib.hual_load_npy_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def load_npy_batch(paths: list[str], max_vlen: int, vdim: int,
                   n_threads: int = 0):
    """Load+downsample many .npy files into one packed block.

    Returns (packed (n, max_vlen, vdim) f32, lengths (n,) i64,
    statuses (n,) i32 — nonzero entries need the NumPy fallback), or None if
    the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    packed = np.zeros((n, max_vlen, vdim), dtype=np.float32)
    lengths = np.zeros((n,), dtype=np.int64)
    statuses = np.zeros((n,), dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.hual_load_npy_batch(
        c_paths, n,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_vlen, vdim, n_threads)
    return packed, lengths, statuses
