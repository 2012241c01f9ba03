"""ctypes binding for the native SE finalizer (native/finalize.cpp).

Takes the fetched device-region arrays and produces finished per-read
SAM records (dedup/patch, primary marking, selection, CIGAR+NM/MD,
XA) in one C call — the host-side record pipeline the reference runs
native (mem_sort_dedup_patch / mem_mark_primary_se / mem_reg2aln,
src/bwamem.cpp). The Python path (ref/finalize.py +
pipeline/finalize.py) remains the oracle and fallback; equality is
asserted by tests/test_native_finalize.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfinalize.so")

_lib = None
_bns_cache = {}

_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_U32P = ctypes.POINTER(ctypes.c_uint32)
_F32P = ctypes.POINTER(ctypes.c_float)
_CP = ctypes.c_char_p


def available() -> bool:
    if os.environ.get("BWA_TPU_NO_NATIVE_FINALIZE"):
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
        subprocess.run(["make", "-C", _NATIVE_DIR, "libfinalize.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.finalize_se_batch.restype = ctypes.c_int64
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _bns_arrays(bns):
    """Cached flat annotation arrays for a bns object."""
    key = id(bns)
    if key in _bns_cache:
        return _bns_cache[key]
    n = len(bns.anns)
    off = np.asarray([a.offset for a in bns.anns], dtype=np.int64)
    lng = np.asarray([a.length for a in bns.anns], dtype=np.int64)
    alt = np.asarray(bns.is_alt, dtype=np.uint8)
    name_off = np.zeros(n, dtype=np.int64)
    parts = []
    pos = 0
    for i, a in enumerate(bns.anns):
        name_off[i] = pos
        nb = a.name.encode() + b"\0"
        parts.append(nb)
        pos += len(nb)
    names = b"".join(parts)
    out = (off, lng, alt, names, name_off)
    _bns_cache[key] = out
    return out


def finalize_se_rows(opt, idx, rows, proc_reads, frac_rep, read_ids,
                     codes, lens, extra_flag: int = 0):
    """Run the native finalizer.

    rows: dict of column arrays (read, rb, re, qb, qe, rid, score,
    truesc, w, seedcov, seedlen0) in read-major order.
    proc_reads: ascending int32 array of read indices to process.
    Returns records_by_read dict {read_idx: [Aln, ...]} or None if the
    native path declined (capacity overflow -> caller falls back).
    """
    from ..ref.finalize import Aln
    lib = _load()
    bns = idx.bns
    ref = idx.ref_string
    if not isinstance(ref, np.ndarray) or ref.dtype != np.uint8:
        ref = np.asarray(ref, dtype=np.uint8)
    ann_off, ann_len, ann_alt, names, name_off = _bns_arrays(bns)

    n_rows = len(rows["read"])
    n_proc = len(proc_reads)
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    frac_rep = np.ascontiguousarray(frac_rep, dtype=np.float32)
    read_ids = np.ascontiguousarray(read_ids, dtype=np.int64)
    proc_reads = np.ascontiguousarray(proc_reads, dtype=np.int32)

    cols = {k: np.ascontiguousarray(
        rows[k], dtype=np.int64 if k in ("rb", "re") else np.int32)
        for k in ("read", "rb", "re", "qb", "qe", "rid", "score",
                  "truesc", "w", "seedcov", "seedlen0")}

    rec_cap = n_rows + n_proc + 8
    CIG_STRIDE = 256
    rd_nrec = np.zeros(n_proc, dtype=np.int32)
    rec_read = np.zeros(rec_cap, dtype=np.int32)
    rec_rid = np.zeros(rec_cap, dtype=np.int32)
    rec_pos = np.zeros(rec_cap, dtype=np.int64)
    rec_flag = np.zeros(rec_cap, dtype=np.int32)
    rec_mapq = np.zeros(rec_cap, dtype=np.int32)
    rec_score = np.zeros(rec_cap, dtype=np.int32)
    rec_sub = np.zeros(rec_cap, dtype=np.int32)
    rec_nm = np.zeros(rec_cap, dtype=np.int32)
    rec_alt_sc = np.zeros(rec_cap, dtype=np.int32)
    rec_is_rev = np.zeros(rec_cap, dtype=np.uint8)
    rec_is_alt = np.zeros(rec_cap, dtype=np.uint8)
    rec_ncig = np.zeros(rec_cap, dtype=np.int32)
    cig_out = np.zeros((rec_cap, CIG_STRIDE), dtype=np.uint32)
    md_cap = max(1 << 16, n_rows * 512)
    xa_cap = max(1 << 16, n_rows * 256)
    md_arena = np.zeros(md_cap, dtype=np.uint8)
    xa_arena = np.zeros(xa_cap, dtype=np.uint8)
    rec_md_off = np.zeros(rec_cap, dtype=np.int64)
    rec_md_len = np.zeros(rec_cap, dtype=np.int32)
    rec_xa_off = np.zeros(rec_cap, dtype=np.int64)
    rec_xa_len = np.zeros(rec_cap, dtype=np.int32)

    mat = np.ascontiguousarray(opt.mat, dtype=np.int8)
    from ..utils.profiling import PROFILER
    with PROFILER.phase("native_c_call"):
        rc = lib.finalize_se_batch(
        ctypes.c_int64(n_rows),
        _ptr(cols["read"], ctypes.c_int32),
        _ptr(cols["rb"], ctypes.c_int64),
        _ptr(cols["re"], ctypes.c_int64),
        _ptr(cols["qb"], ctypes.c_int32),
        _ptr(cols["qe"], ctypes.c_int32),
        _ptr(cols["rid"], ctypes.c_int32),
        _ptr(cols["score"], ctypes.c_int32),
        _ptr(cols["truesc"], ctypes.c_int32),
        _ptr(cols["w"], ctypes.c_int32),
        _ptr(cols["seedcov"], ctypes.c_int32),
        _ptr(cols["seedlen0"], ctypes.c_int32),
        ctypes.c_int64(n_proc),
        _ptr(proc_reads, ctypes.c_int32),
        _ptr(frac_rep, ctypes.c_float),
        _ptr(read_ids, ctypes.c_int64),
        _ptr(codes, ctypes.c_int32),
        ctypes.c_int64(codes.shape[1]),
        _ptr(lens, ctypes.c_int32),
        _ptr(ref, ctypes.c_uint8),
        ctypes.c_int64(bns.l_pac),
        ctypes.c_int64(len(bns.anns)),
        _ptr(ann_off, ctypes.c_int64),
        _ptr(ann_len, ctypes.c_int64),
        _ptr(ann_alt, ctypes.c_uint8),
        ctypes.c_char_p(names),
        _ptr(name_off, ctypes.c_int64),
        _ptr(mat, ctypes.c_int8),
        ctypes.c_int32(opt.a), ctypes.c_int32(opt.b),
        ctypes.c_int32(opt.o_del), ctypes.c_int32(opt.e_del),
        ctypes.c_int32(opt.o_ins), ctypes.c_int32(opt.e_ins),
        ctypes.c_int32(opt.w), ctypes.c_int32(opt.T),
        ctypes.c_int32(opt.min_seed_len),
        ctypes.c_int32(opt.max_chain_gap),
        ctypes.c_double(opt.mask_level),
        ctypes.c_double(opt.drop_ratio),
        ctypes.c_double(opt.XA_drop_ratio),
        ctypes.c_double(opt.mask_level_redun),
        ctypes.c_int32(opt.max_XA_hits),
        ctypes.c_int32(opt.max_XA_hits_alt),
        ctypes.c_int32(opt.mapQ_coef_len),
        ctypes.c_double(opt.mapQ_coef_fac),
        ctypes.c_int32(opt.flag),
        ctypes.c_int32(extra_flag),
        _ptr(rd_nrec, ctypes.c_int32),
        ctypes.c_int64(rec_cap),
        _ptr(rec_read, ctypes.c_int32),
        _ptr(rec_rid, ctypes.c_int32),
        _ptr(rec_pos, ctypes.c_int64),
        _ptr(rec_flag, ctypes.c_int32),
        _ptr(rec_mapq, ctypes.c_int32),
        _ptr(rec_score, ctypes.c_int32),
        _ptr(rec_sub, ctypes.c_int32),
        _ptr(rec_nm, ctypes.c_int32),
        _ptr(rec_alt_sc, ctypes.c_int32),
        _ptr(rec_is_rev, ctypes.c_uint8),
        _ptr(rec_is_alt, ctypes.c_uint8),
        _ptr(rec_ncig, ctypes.c_int32),
        _ptr(cig_out.reshape(-1), ctypes.c_uint32),
        ctypes.c_int32(CIG_STRIDE),
        md_arena.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(md_cap),
        _ptr(rec_md_off, ctypes.c_int64),
        _ptr(rec_md_len, ctypes.c_int32),
        xa_arena.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(xa_cap),
        _ptr(rec_xa_off, ctypes.c_int64),
        _ptr(rec_xa_len, ctypes.c_int32),
    )
    if rc == -1:
        return None          # capacity: fall back to the Python path
    if rc == -2:
        raise RuntimeError("native finalize: rid consistency failure")
    n_rec = int(rc)

    # Bulk-convert once (tolist is a C loop; per-element np scalar
    # access costs more than the native call itself at batch scale).
    with PROFILER.phase("native_conv"):
        md_bytes = md_arena.tobytes()
        xa_bytes = xa_arena.tobytes()
        meta = np.stack([rec_read[:n_rec], rec_rid[:n_rec],
                         rec_flag[:n_rec], rec_mapq[:n_rec],
                         rec_score[:n_rec], rec_sub[:n_rec],
                         rec_nm[:n_rec], rec_alt_sc[:n_rec],
                         rec_ncig[:n_rec]], axis=1).tolist()
        pos_l = rec_pos[:n_rec].tolist()
        isrev_l = rec_is_rev[:n_rec].tolist()
        isalt_l = rec_is_alt[:n_rec].tolist()
        mdo = rec_md_off[:n_rec].tolist()
        mdl = rec_md_len[:n_rec].tolist()
        xao = rec_xa_off[:n_rec].tolist()
        xal = rec_xa_len[:n_rec].tolist()
        # slice to the widest actual CIGAR before tolist — converting the
        # full [n_rec, 256] arena is ~1M Python ints per batch
        w_cig = int(rec_ncig[:n_rec].max()) if n_rec else 1
        cig_l = cig_out[:n_rec, :max(w_cig, 1)].tolist()

        out = {}
        for j in range(n_rec):
            (rd, rid, flag, mapq, score, sub, nm, alt_sc, ncig) = meta[j]
            a = Aln()
            a.rid = rid
            a.pos = pos_l[j]
            a.flag = flag
            a.mapq = mapq
            a.score = score
            a.sub = sub
            a.NM = nm
            a.alt_sc = alt_sc
            a.is_rev = bool(isrev_l[j])
            a.is_alt = bool(isalt_l[j])
            if rid >= 0:
                row = cig_l[j]
                a.cigar = [(row[k] >> 4, row[k] & 0xF) for k in range(ncig)]
                a.MD = md_bytes[mdo[j]: mdo[j] + mdl[j]].decode()
            a.XA = (xa_bytes[xao[j]: xao[j] + xal[j]].decode()
                    if xal[j] else None)
            out.setdefault(rd, []).append(a)
        return out

