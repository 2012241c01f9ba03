"""ctypes binding for the native EMF grouper (native/emf.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libemf.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "emf.cpp")
        if not os.path.exists(src):
            raise ImportError("native emf source missing")
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-pthread", "-o", _LIB_PATH, src])
    lib = ctypes.CDLL(_LIB_PATH)
    lib.emf_group.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.emf_group.restype = ctypes.c_int64
    lib.emf_insert.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.emf_insert.restype = ctypes.c_int64
    P8 = ctypes.POINTER(ctypes.c_uint8)
    P32 = ctypes.POINTER(ctypes.c_int32)
    Pu32 = ctypes.POINTER(ctypes.c_uint32)
    P64 = ctypes.POINTER(ctypes.c_int64)
    Pu64 = ctypes.POINTER(ctypes.c_uint64)
    lib.emf_insert_chunk.argtypes = [
        P8, ctypes.c_int32,
        P64, P8,
        Pu64, P64, P64, ctypes.c_int64, P64,
        P64, P64,
        P64, Pu32, P8, P32,
        ctypes.c_int64, ctypes.c_int64, P64,
        P64, P64, P8, ctypes.c_int64]
    lib.emf_insert_chunk.restype = ctypes.c_int64
    _lib = lib
    return lib


def insert_chunk(seq, S, positions, pos_fwless, grp_h, grp_rep,
                 grp_cnt, grp_order, memb_idx, memb_off,
                 loc, fp, fwl, cnt, budget_entries, state):
    """Stream one chunk's groups into the persistent table arrays.
    Returns (mlog_slot, mlog_pos, mlog_same) — members beyond each
    entry's stored location."""
    lib = _load()
    P8 = ctypes.POINTER(ctypes.c_uint8)
    P32 = ctypes.POINTER(ctypes.c_int32)
    Pu32 = ctypes.POINTER(ctypes.c_uint32)
    P64 = ctypes.POINTER(ctypes.c_int64)
    Pu64 = ctypes.POINTER(ctypes.c_uint64)
    c = lambda a, t: np.ascontiguousarray(a).ctypes.data_as(t)
    n = len(positions)
    mlog_slot = np.empty(n, dtype=np.int64)
    mlog_pos = np.empty(n, dtype=np.int64)
    mlog_same = np.empty(n, dtype=np.uint8)
    n_log = lib.emf_insert_chunk(
        c(seq, P8), S,
        c(positions, P64), c(pos_fwless, P8),
        c(grp_h, Pu64), c(grp_rep, P64),
        c(grp_cnt, P64), len(grp_rep), c(grp_order, P64),
        c(memb_idx, P64), c(memb_off, P64),
        loc.ctypes.data_as(P64), fp.ctypes.data_as(Pu32),
        fwl.ctypes.data_as(P8), cnt.ctypes.data_as(P32),
        len(loc), budget_entries,
        state.ctypes.data_as(P64),
        mlog_slot.ctypes.data_as(P64), mlog_pos.ctypes.data_as(P64),
        mlog_same.ctypes.data_as(P8), n)
    if n_log < 0:
        raise RuntimeError("emf merge log overflow")
    n_log = int(n_log)
    return (mlog_slot[:n_log].copy(), mlog_pos[:n_log].copy(),
            mlog_same[:n_log].copy().astype(bool))


def group_windows(seq: np.ndarray, positions: np.ndarray, S: int):
    """Returns (fwless bool[n], hash uint64[n], gid int64[n], n_grp,
    rep int64[n_grp], cnt int64[n_grp])."""
    lib = _load()
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    n = len(positions)
    fwless = np.empty(n, dtype=np.uint8)
    h = np.empty(n, dtype=np.uint64)
    gid = np.empty(n, dtype=np.int64)
    rep = np.empty(n, dtype=np.int64)
    cnt = np.empty(n, dtype=np.int64)
    n_grp = lib.emf_group(
        seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, S,
        fwless.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        gid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    n_grp = int(n_grp)
    return (fwless.astype(bool), h, gid, n_grp,
            rep[:n_grp].copy(), cnt[:n_grp].copy())


def insert_table(grp_h: np.ndarray, ncap: int, tab: np.ndarray) -> int:
    """Sequential linear-probe insertion; returns max probe count."""
    lib = _load()
    grp_h = np.ascontiguousarray(grp_h, dtype=np.uint64)
    assert tab.dtype == np.int64 and len(tab) == ncap
    return int(lib.emf_insert(
        grp_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(grp_h), ncap,
        tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))))
