"""Pallas TPU kernel for batched banded Smith-Waterman extension.

Same semantics as ops/bsw.banded_swa_batch (the scalar spec is the
reference's scalarBandedSWA, src/bandedSWA.cpp:116-238) but the DP
row loop runs entirely in VMEM: the jnp while-loop version pays ~15
HBM round trips over [P, QL] state per target row, which made BSW the
largest slice of the extend program (0.19 s/batch at 16 k pairs).
Here each grid step owns a block of BP pairs, holds the two eh state
planes as loop-carried VMEM values, and iterates only until its own
lanes are all retired — pairs are pre-sorted by target length by the
wrapper (the lane-coherence sort of sortPairsLen[Ext],
src/bwamem.cpp:2667-2805), so short blocks exit after a handful of
rows instead of marching to the global max.

Layout is transposed vs the jnp kernel: [query_axis, pair_lanes] —
the per-row target byte broadcasts along the major axis for free, the
row-wise prefix-max runs as log2 static sublane shifts, and per-lane
scalars live as [1, BP] rows that use all 128 VPU lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsw import BswBatchResult

NEG = -(1 << 30)


def _rup(n: int, m: int) -> int:
    return -(-n // m) * m


def _shift_down(x, k, fill):
    """out[j] = x[j - k] along axis 0; rows < k get `fill`."""
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _cummax0(x):
    """Running max along axis 0 (inclusive), log2 static shifts."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = jnp.maximum(x, _shift_down(x, k, NEG))
        k <<= 1
    return x


def _bsw_kernel(meta_ref, qs_ref, ts_ref, out_ref, *, QL, TL,
                o_del, e_del, o_ins, e_ins, zdrop,
                sc_match, sc_mis, sc_n):
    # Every scalar constant is bound as a concrete i32: under
    # jax_enable_x64 a Python int meeting an array in where/clip/etc.
    # lowers as an i64 scalar, which Mosaic cannot convert (infinite
    # _convert_helper recursion / "64-bit types are not supported").
    i32 = jnp.int32
    c = lambda v: jnp.int32(v)
    QP = qs_ref.shape[0]                 # padded query rows
    BP = qs_ref.shape[1]

    q_lens = meta_ref[0:1, :]            # [1, BP]
    t_lens = meta_ref[1:2, :]
    h0 = meta_ref[2:3, :]
    w_p = meta_ref[3:4, :]

    q_codes = jnp.clip(qs_ref[:, :], c(0), c(4))        # [QP, BP]
    rowq = jax.lax.broadcasted_iota(i32, (QP, BP), 0)  # eh/DP row index

    # -- first eh_h row set: h0, then the decaying insertion ramp ----
    h1 = jnp.maximum(h0 - c(o_ins + e_ins), c(0))       # [1, BP]
    raw = h1 - c(e_ins) * (rowq - c(1))                 # rows >= 1
    prev_ok = (h1 - c(e_ins) * (rowq - c(2))) > c(e_ins)
    val = jnp.where(rowq == c(0), h0,
                    jnp.where(rowq == c(1), h1,
                              jnp.where(prev_ok,
                                        jnp.maximum(raw, c(0)), c(0))))
    eh_h0 = jnp.where(rowq <= q_lens, val, c(0)).astype(i32)
    eh_e0 = jnp.zeros((QP, BP), i32)

    zero1 = jnp.zeros((1, BP), i32)
    st0 = (jnp.int32(0), eh_h0, eh_e0,
           zero1, q_lens.astype(i32),                    # beg, end
           h0.astype(i32),                               # max_sc
           jnp.full((1, BP), -1, i32),                   # max_i
           jnp.full((1, BP), -1, i32),                   # max_j
           jnp.full((1, BP), -1, i32),                   # max_ie
           jnp.full((1, BP), -1, i32),                   # gscore
           zero1,                                        # max_off
           # alive carried as i32: an i1 vector loop carry fails to
           # legalize in Mosaic's scf.while lowering
           ((t_lens > c(0)) & (q_lens > c(0))).astype(i32))

    def cond(st):
        # (an any()-style bool reduce lowers through an f64 scalar
        # squeeze on Mosaic under x64; i32 max-reduce is supported)
        return jnp.max(st[11]) > 0

    def body(st):
        (i, eh_h, eh_e, beg0, end0, max_sc, max_i, max_j, max_ie,
         gscore, max_off, alive_i) = st
        alive = (alive_i > c(0)) & (i < t_lens)
        tb = jnp.clip(ts_ref[pl.ds(i, 1), :], c(0), c(4))  # [1, BP]
        is_n = (tb == c(4)) | (q_codes == c(4))
        qprof = jnp.where(is_n, c(sc_n),
                          jnp.where(tb == q_codes, c(sc_match),
                                    c(sc_mis)))

        beg = jnp.maximum(beg0, i - w_p)
        end = jnp.minimum(jnp.minimum(end0, i + w_p + c(1)), q_lens)
        h1_first = jnp.where(
            beg == c(0),
            jnp.maximum(h0 - (c(o_del) + c(e_del) * (i + c(1))), c(0)),
            c(0))

        in_band = (rowq >= beg) & (rowq < end)
        M = jnp.where(eh_h != c(0), eh_h + qprof, c(0))
        pre = jnp.maximum(M, eh_e)

        # F via prefix-max with gap-extension decay
        t_ins = jnp.maximum(M - c(o_ins + e_ins), c(0))
        keyed = jnp.where(in_band, t_ins + c(e_ins) * rowq, c(NEG))
        run = _shift_down(_cummax0(keyed), 1, NEG)
        f = jnp.maximum(run - c(e_ins) * (rowq - c(1)), c(0))
        f = jnp.where(rowq == beg, c(0), f)

        H = jnp.where(in_band, jnp.maximum(pre, f), c(0))

        # row max + LAST attaining row
        Hm = jnp.where(in_band, H, c(-1))
        raw_max = jnp.max(Hm, axis=0, keepdims=True)     # [1, BP]
        att = Hm == raw_max
        mj_last = jnp.max(jnp.where(att, rowq, c(-1)), axis=0,
                          keepdims=True)
        mrow = jnp.maximum(raw_max, c(0))
        mj = jnp.where(mrow > c(0), mj_last, c(-1))

        E_next = jnp.maximum(jnp.maximum(M - c(o_del + e_del), c(0)),
                             eh_e - c(e_del))

        # write back the shifted H row / next E row on [beg, end]
        Hsh = _shift_down(H, 1, 0)                       # [QP, BP]
        upd_h = (rowq >= beg + c(1)) & (rowq <= end)
        new_h = jnp.where(upd_h, Hsh, eh_h)
        new_h = jnp.where(rowq == beg, h1_first, new_h)
        upd_e = (rowq >= beg) & (rowq < end)
        new_e = jnp.where(upd_e, E_next, eh_e)
        end_c = jnp.clip(end, c(0), c(QL))
        at_end = rowq == end_c
        new_e = jnp.where(at_end, c(0), new_e)
        h1_last = jnp.sum(jnp.where(at_end, Hsh, c(0)), axis=0,
                          keepdims=True, dtype=i32)
        h1_last = jnp.where(end > beg, h1_last, h1_first)
        new_h = jnp.where(at_end, h1_last, new_h)

        eh_h2 = jnp.where(alive, new_h, eh_h)
        eh_e2 = jnp.where(alive, new_e, eh_e)

        # gscore when the band reached the query end
        reach = alive & (end == q_lens)
        gupd = reach & (gscore <= h1_last)
        gscore2 = jnp.where(gupd, h1_last, gscore)
        max_ie2 = jnp.where(gupd, i, max_ie)

        brk0 = alive & (mrow == c(0))
        better = alive & ~brk0 & (mrow > max_sc)
        off = jnp.abs(mj - i)
        max_off2 = jnp.where(better, jnp.maximum(max_off, off),
                             max_off)
        diag_i = i - max_i
        diag_j = mj - max_j
        zdelta = jnp.where(diag_i > diag_j,
                           max_sc - mrow - (diag_i - diag_j) * c(e_del),
                           max_sc - mrow - (diag_j - diag_i) * c(e_ins))
        brkz = (alive & ~brk0 & ~better
                & (zdelta > c(zdrop)) if zdrop > 0
                else jnp.zeros_like(alive))

        max_sc2 = jnp.where(better, mrow, max_sc)
        max_i2 = jnp.where(better, i, max_i)
        max_j2 = jnp.where(better, mj, max_j)

        # adaptive band shrink on the freshly written rows
        zcell = (new_h == c(0)) & (new_e == c(0))
        cand = ~zcell & (rowq >= beg) & (rowq < end)
        lead = jnp.min(jnp.where(cand, rowq, c(1 << 30)), axis=0,
                       keepdims=True)
        beg2 = jnp.where(lead < c(1 << 30), lead, end)
        cand2 = ~zcell & (rowq >= beg2) & (rowq <= end)
        tail = jnp.max(jnp.where(cand2, rowq, c(NEG)), axis=0,
                       keepdims=True)
        jpos = jnp.where(tail > c(NEG), tail, beg2 - c(1))
        end2 = jnp.minimum(jpos + c(2), q_lens)

        alive2 = alive & ~brk0 & ~brkz
        beg3 = jnp.where(alive, beg2, beg0)
        end3 = jnp.where(alive, end2, end0)
        return (i + c(1), eh_h2, eh_e2, beg3, end3, max_sc2, max_i2,
                max_j2, max_ie2, gscore2, max_off2,
                alive2.astype(i32))

    stf = jax.lax.while_loop(cond, body, st0)
    # one aligned 8-row store (a 6-row block's sublane dim would be
    # unaligned): max_sc, max_j, max_i, max_ie, gscore, max_off, pad
    out_ref[:, :] = jnp.concatenate(
        [stf[5], stf[7], stf[6], stf[8], stf[9], stf[10],
         jnp.zeros((2, BP), i32)], axis=0)


def _trunc_div(n, d):
    return jnp.where(n >= 0, n // d, -((-n) // d))


def banded_swa_batch_pallas(qs, q_lens, ts, t_lens, h0, w: int,
                            o_del: int, e_del: int, o_ins: int,
                            e_ins: int, zdrop: int, mat,
                            end_bonus: int = 0, block: int = 256,
                            interpret: bool = False
                            ) -> BswBatchResult:
    """Drop-in replacement for ops.bsw.banded_swa_batch (bit-equal).

    Sorts pairs by masked target length, runs the Pallas kernel over
    BP-lane blocks (each exits at its own longest lane), and inverse-
    permutes the six result vectors.
    """
    P, QL = qs.shape
    TL = ts.shape[1]
    i32 = jnp.int32
    q_lens = q_lens.astype(i32)
    t_lens = t_lens.astype(i32)
    h0 = h0.astype(i32)

    mat_np = np.asarray(mat)
    mx = int(mat_np.max())
    sc = dict(sc_match=int(mat_np[0, 0]), sc_mis=int(mat_np[0, 1]),
              sc_n=int(mat_np[0, 4]))

    # per-pair band clamp (C-truncation), as in the jnp kernel
    max_ins = _trunc_div(q_lens * mx + end_bonus - o_ins, e_ins) + 1
    max_del = _trunc_div(q_lens * mx + end_bonus - o_del, e_del) + 1
    w_p = jnp.minimum(jnp.asarray(w, i32),
                      jnp.minimum(jnp.maximum(max_ins, 1),
                                  jnp.maximum(max_del, 1))).astype(i32)

    # lane-coherence sort: dead lanes (len 0) first, then by t_len
    eff_t = jnp.where((t_lens > 0) & (q_lens > 0), t_lens, 0)
    perm = jnp.argsort(eff_t).astype(i32)

    BP = block
    Pp = _rup(max(P, BP), BP)
    pad = Pp - P

    def permute(x, fill=0):
        x = jnp.take(x, perm, axis=0)
        if pad:
            padw = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, padw, constant_values=fill)
        return x

    QP = _rup(QL + 2, 8)
    TP = _rup(TL, 8)
    qs_t = jnp.pad(permute(qs.astype(i32)),
                   ((0, 0), (0, QP - QL))).T               # [QP, Pp]
    ts_t = jnp.pad(permute(ts.astype(i32)),
                   ((0, 0), (0, TP - TL))).T               # [TP, Pp]
    meta = jnp.stack([permute(q_lens), permute(t_lens), permute(h0),
                      permute(w_p)], axis=0)               # [4, Pp]

    kern = functools.partial(_bsw_kernel, QL=QL, TL=TL,
                             o_del=o_del, e_del=e_del, o_ins=o_ins,
                             e_ins=e_ins, zdrop=zdrop, **sc)
    # index maps: the constant block coordinate must be an i32 — under
    # global jax_enable_x64 a bare Python 0 lowers as i64, which Mosaic
    # rejects at func.return
    imap = lambda i: (jnp.int32(0), i)
    out = pl.pallas_call(
        kern,
        grid=(Pp // BP,),
        in_specs=[
            pl.BlockSpec((4, BP), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((QP, BP), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, BP), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BP), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Pp), jnp.int32),
        interpret=interpret,
    )(meta, qs_t, ts_t)

    # inverse permutation: column r of `out` is pair perm[r]
    inv = jnp.zeros((P,), i32).at[perm].set(jnp.arange(P, dtype=i32))
    unperm = jnp.take(out, inv, axis=1)
    return BswBatchResult(score=unperm[0], qle=unperm[1] + 1,
                          tle=unperm[2] + 1, gtle=unperm[3] + 1,
                          gscore=unperm[4], max_off=unperm[5])
