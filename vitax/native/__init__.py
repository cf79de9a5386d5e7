"""ctypes binding + on-demand build of the native host runtime.

`assemble_batch` is the hot path of the input pipeline (gather + flip +
bilinear resize + normalize, multithreaded in C++). The library is compiled
once with g++ into a per-user cache dir; every entry point degrades
gracefully to the numpy/PIL path when a toolchain is unavailable
(`native_available()` gates use).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "batchops.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.environ.get(
            "VITAX_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "vitax"))
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"libvitaxnative-{digest}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                   "-std=c++17", _SRC, "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.vitax_assemble_batch.restype = ctypes.c_int
        lib.vitax_assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        lib.vitax_normalize.restype = None
        lib.vitax_normalize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64]
        lib.vitax_version.restype = ctypes.c_int
        assert lib.vitax_version() == 1
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                if os.environ.get("VITAX_DISABLE_NATIVE", "0") != "1":
                    _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def assemble_batch(data: np.ndarray, indices: np.ndarray,
                   flips: Optional[np.ndarray], batch: int,
                   out_hw: tuple, num_threads: int = 0) -> Optional[np.ndarray]:
    """data [N,h,w,3] uint8 → batch [B,dh,dw,3] float32 in [-1,1];
    None when the native library is unavailable (caller falls back)."""
    lib = _get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    n, sh, sw, ch = data.shape
    if ch != 3:
        return None
    idx = np.ascontiguousarray(indices, np.int64)
    fl = (np.ascontiguousarray(flips, np.uint8)
          if flips is not None else None)
    dh, dw = out_hw
    out = np.empty((batch, dh, dw, 3), np.float32)
    rc = lib.vitax_assemble_batch(
        data.ctypes.data_as(ctypes.c_void_p), n, sh, sw,
        idx.ctypes.data_as(ctypes.c_void_p),
        fl.ctypes.data_as(ctypes.c_void_p) if fl is not None else None,
        len(idx), batch, dh, dw,
        out.ctypes.data_as(ctypes.c_void_p), num_threads)
    if rc != 0:
        return None
    return out
