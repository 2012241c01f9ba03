"""ctypes binding for the native CIGAR finalizer (native/kswg.cpp).

Runs the full bwa_gen_cigar2 + mem_reg2aln retry loop + NM/MD per
output record on the host (the reference's own CIGAR architecture,
src/bwa.cpp:380-470, src/bwamem.cpp:2533-2624). Used by
pipeline/finalize.BatchFinalizer in place of the device DP — each job
is a tiny banded DP, so a native batch call beats a device round trip
by orders of magnitude on this platform.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libkswg.so")

_lib = None


def available() -> bool:
    if os.environ.get("BWA_TPU_NO_NATIVE_KSWG"):
        return False
    try:
        _load()
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "kswg.cpp")
        if not os.path.exists(src):
            raise ImportError("native kswg source missing")
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src])
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.kswg_finalize_batch.argtypes = [
        ctypes.c_int64,
        u8p, i64p, i32p,          # query buf/off/len
        u8p, i64p, i32p,          # target buf/off/len
        i32p, i32p, u8p,          # w2, truesc, is_fw
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,           # mat, o_del, e_del, o_ins, e_ins
        ctypes.c_int32, ctypes.c_int32,  # a, maxw
        i32p, u32p, i32p, ctypes.c_int32,  # score, cigar, ncig, stride
        i32p, ctypes.c_char_p, i32p, ctypes.c_int32,  # nm, md, mdlen
    ]
    lib.kswg_finalize_batch.restype = ctypes.c_int64
    _lib = lib
    return lib


def finalize_batch(jobs, opt):
    """Run score/cigar/NM/MD for a list of finalize._Job; fills
    j.cigar, j.score, j.nm, j.md in place."""
    lib = _load()
    n = len(jobs)
    if n == 0:
        return
    qlens = np.array([len(j.query) for j in jobs], np.int32)
    tlens = np.array([len(j.rseq) for j in jobs], np.int32)
    qoff = np.zeros(n, np.int64)
    toff = np.zeros(n, np.int64)
    np.cumsum(qlens[:-1], out=qoff[1:])
    np.cumsum(tlens[:-1], out=toff[1:])
    qbuf = np.empty(int(qlens.sum()), np.uint8)
    tbuf = np.empty(int(tlens.sum()), np.uint8)
    for k, j in enumerate(jobs):
        qbuf[qoff[k]: qoff[k] + qlens[k]] = j.query
        tbuf[toff[k]: toff[k] + tlens[k]] = j.rseq
    w2 = np.array([j.w2 for j in jobs], np.int32)
    truesc = np.array([j.truesc for j in jobs], np.int32)
    is_fw = np.array([1 if j.is_fw else 0 for j in jobs], np.uint8)
    mat = np.ascontiguousarray(opt.mat, np.int8)
    cig_stride = int(qlens.max() + tlens.max() + 4)
    md_stride = int(4 * qlens.max() + 32)
    score = np.empty(n, np.int32)
    ncig = np.empty(n, np.int32)
    cig = np.empty((n, cig_stride), np.uint32)
    nm = np.empty(n, np.int32)
    md = np.zeros(n * md_stride, np.uint8)
    mdlen = np.empty(n, np.int32)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    rc = lib.kswg_finalize_batch(
        n,
        qbuf.ctypes.data_as(u8p), qoff.ctypes.data_as(i64p),
        qlens.ctypes.data_as(i32p),
        tbuf.ctypes.data_as(u8p), toff.ctypes.data_as(i64p),
        tlens.ctypes.data_as(i32p),
        w2.ctypes.data_as(i32p), truesc.ctypes.data_as(i32p),
        is_fw.ctypes.data_as(u8p),
        mat.ctypes.data_as(i8p), opt.o_del, opt.e_del, opt.o_ins,
        opt.e_ins, opt.a, opt.w << 2,
        score.ctypes.data_as(i32p),
        cig.ctypes.data_as(u32p), ncig.ctypes.data_as(i32p),
        cig_stride,
        nm.ctypes.data_as(i32p),
        md.ctypes.data_as(ctypes.c_char_p),
        mdlen.ctypes.data_as(i32p), md_stride)
    if rc != 0:
        raise RuntimeError(f"kswg cigar overflow at job {rc - 1}")
    md = md.reshape(n, md_stride)
    for k, j in enumerate(jobs):
        j.score = int(score[k])
        row = cig[k, : ncig[k]]
        j.cigar = [(int(c) >> 4, int(c) & 0xF) for c in row]
        j.nm = int(nm[k])
        j.md = md[k, : mdlen[k]].tobytes().decode()
