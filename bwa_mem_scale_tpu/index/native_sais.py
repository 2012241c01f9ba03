"""ctypes binding for the native SA-IS library (native/sais.cpp).

Builds the library on first use if g++ is available; callers fall back
to the NumPy prefix-doubling sort when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsais.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "sais.cpp")
        if not os.path.exists(src):
            raise ImportError("native sais source missing")
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src])
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sais_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64]
    lib.sais_u8.restype = ctypes.c_int
    lib.bwt_from_sa_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint8]
    lib.bwt_from_sa_u8.restype = ctypes.c_int64
    _lib = lib
    return lib


def suffix_array(text: np.ndarray) -> np.ndarray:
    """SA of text+sentinel (length n+1, SA[0] = n), like
    build.suffix_array_doubling."""
    lib = _load()
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    # Single allocation: the native call writes the body directly into
    # sa[1:] (at genome scale a separate body buffer would double a
    # ~50 GB allocation).
    sa = np.empty(n + 1, dtype=np.int64)
    sa[0] = n
    if n:
        body_ptr = ctypes.cast(
            sa.ctypes.data + np.dtype(np.int64).itemsize,
            ctypes.POINTER(ctypes.c_int64))
        rc = lib.sais_u8(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            body_ptr,
            ctypes.c_int64(n), ctypes.c_int64(int(text.max()) + 1))
        if rc != 0:
            raise RuntimeError(f"sais_u8 failed: {rc}")
    return sa


def bwt_from_sa(text: np.ndarray, sa: np.ndarray):
    """Native BWT extraction with prefetch; same contract as
    build.bwt_from_sa. Returns (bwt uint8 [len(sa)], sentinel_index)."""
    lib = _load()
    text = np.ascontiguousarray(text, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    out = np.empty(len(sa), dtype=np.uint8)
    sentinel = lib.bwt_from_sa_u8(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(sa)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint8(4))
    if sentinel < 0:
        raise RuntimeError("bwt_from_sa_u8: no sentinel row found")
    return out, int(sentinel)
