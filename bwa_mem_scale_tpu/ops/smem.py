"""Batched lockstep SMEM search on device.

TPU-native re-formulation of the reference's three seeding passes
(mem_collect_smem, src/bwamem.cpp:648-795):

- pass 1: all-position SMEM search (getSMEMsAllPosOneThread,
  src/FMI_search.cpp:1608-1660) — every read advances its own start
  cursor x; the batch runs in lockstep through masked while-loops, each
  step performing one batched occ gather for all active lanes.
- pass 2: re-seeding at the midpoint of long low-occurrence SMEMs
  (getSMEMsOnePosOneThread with min_intv = s+1).
- pass 3: forward-only seed strategy emitting the first interval that
  drops below max_mem_intv (bwtSeedStrategyAllPosOneThread,
  src/FMI_search.cpp:1662-1815).

Where the reference compacts the active read set between batches
(head/tail copy, FMI_search.cpp:1629-1657), we keep lanes resident and
mask them — the TPU's vector lanes make idle work free relative to the
gather traffic.

Output: per-read SMEM arrays sorted by (m, n), ready for SA lookup and
chaining. All loops are fixed-shape; overflow of the per-read output
capacity is detectable via the returned counts (tests assert headroom).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .occ import DeviceFMIndex, backward_ext_all4


class SmemBuf(NamedTuple):
    """Per-read SMEM output buffers ([B, M] each) + counts [B]."""
    m: jax.Array
    n: jax.Array
    k: jax.Array
    l: jax.Array
    s: jax.Array
    cnt: jax.Array

    @classmethod
    def empty(cls, B: int, M: int, pos_dtype):
        zi = jnp.zeros((B, M), dtype=jnp.int32)
        zp = jnp.zeros((B, M), dtype=pos_dtype)
        return cls(zi, zi, zp, zp, zp, jnp.zeros((B,), dtype=jnp.int32))

    def emit(self, mask, m, n, k, l, s):
        """Masked append of one record per lane."""
        B, M = self.m.shape
        bidx = jnp.arange(B)
        idx = jnp.where(mask, self.cnt, M)  # out-of-bounds rows drop
        return SmemBuf(
            self.m.at[bidx, idx].set(m, mode="drop"),
            self.n.at[bidx, idx].set(n, mode="drop"),
            self.k.at[bidx, idx].set(k, mode="drop"),
            self.l.at[bidx, idx].set(l, mode="drop"),
            self.s.at[bidx, idx].set(s, mode="drop"),
            self.cnt + mask.astype(jnp.int32),
        )


def _fwd_ext4(fmi, k, l, s, a):
    """Forward extension by base a via the k/l swap (one fused gather)."""
    k4, l4, s4 = backward_ext_all4(fmi, l, k, s)
    ai = (3 - a)[..., None].astype(jnp.int32)
    take = lambda v: jnp.take_along_axis(v, ai, axis=-1)[..., 0]
    # swap back: new_k = l-result, new_l = k-result
    return take(l4), take(k4), take(s4)


def _bwd_ext4(fmi, k, l, s, a):
    k4, l4, s4 = backward_ext_all4(fmi, k, l, s)
    ai = a[..., None].astype(jnp.int32)
    take = lambda v: jnp.take_along_axis(v, ai, axis=-1)[..., 0]
    return take(k4), take(l4), take(s4)


def _one_pos(fmi: DeviceFMIndex, codes, lens, x, min_intv, active_in,
             min_seed_len: int, out: SmemBuf):
    """Lockstep getSMEMsOnePosOneThread over the batch.

    codes [B, L] int32, lens/x/min_intv [B], active_in [B] bool.
    Returns (next_x [B], out).
    """
    B, L = codes.shape
    P = L + 1
    pos_dtype = fmi.pos_dtype
    bidx = jnp.arange(B)
    min_intv_p = min_intv.astype(pos_dtype)

    a0 = codes[bidx, jnp.clip(x, 0, L - 1)]
    lane_ok = active_in & (x < lens) & (a0 < 4)
    next_x = x + 1

    a0c = jnp.clip(a0, 0, 3)
    cur_k = fmi.count[a0c]
    cur_l = fmi.count[3 - a0c]
    cur_s = fmi.count[a0c + 1] - fmi.count[a0c]
    cur_m = x
    cur_n = x

    prev_k = jnp.zeros((B, P), dtype=pos_dtype)
    prev_l = jnp.zeros((B, P), dtype=pos_dtype)
    prev_s = jnp.zeros((B, P), dtype=pos_dtype)
    prev_m = jnp.zeros((B, P), dtype=jnp.int32)
    prev_n = jnp.zeros((B, P), dtype=jnp.int32)
    prev_cnt = jnp.zeros((B,), dtype=jnp.int32)

    def pappend(bufs, cnt, mask, k, l, s, m, n):
        pk, pl, ps, pm, pn = bufs
        idx = jnp.where(mask, cnt, P)
        return ((pk.at[bidx, idx].set(k, mode="drop"),
                 pl.at[bidx, idx].set(l, mode="drop"),
                 ps.at[bidx, idx].set(s, mode="drop"),
                 pm.at[bidx, idx].set(m, mode="drop"),
                 pn.at[bidx, idx].set(n, mode="drop")),
                cnt + mask.astype(jnp.int32))

    # ---------------- forward phase ----------------
    def fwd_cond(st):
        t, fwd_active, *_ = st
        return jnp.any(fwd_active) & (t < L)

    def fwd_body(st):
        (t, fwd_active, ck, cl, cs, cn, bufs, pcnt, nx) = st
        j = x + t
        in_bounds = j < lens
        a = codes[bidx, jnp.clip(j, 0, L - 1)]
        step = fwd_active & in_bounds
        nx = jnp.where(step, j + 1, nx)
        is_n = a >= 4
        do_ext = step & ~is_n
        nk, nl, ns = _fwd_ext4(fmi, ck, cl, cs, jnp.clip(a, 0, 3))
        s_changed = ns != cs
        bufs, pcnt = pappend(bufs, pcnt, do_ext & s_changed,
                             ck, cl, cs, x, cn)
        fail = ns < min_intv_p
        nx = jnp.where(do_ext & fail, j, nx)
        keep = do_ext & ~fail
        ck = jnp.where(keep, nk, ck)
        cl = jnp.where(keep, nl, cl)
        cs = jnp.where(keep, ns, cs)
        cn = jnp.where(keep, j, cn)
        fwd_active = keep
        return (t + 1, fwd_active, ck, cl, cs, cn, bufs, pcnt, nx)

    init = (jnp.int32(1), lane_ok, cur_k, cur_l, cur_s, cur_n,
            (prev_k, prev_l, prev_s, prev_m, prev_n), prev_cnt, next_x)
    (_, _, cur_k, cur_l, cur_s, cur_n,
     bufs, prev_cnt, next_x) = jax.lax.while_loop(fwd_cond, fwd_body, init)

    # Final forward append (may duplicate the last entry, matching the
    # reference's break path — harmless downstream).
    bufs, prev_cnt = pappend(bufs, prev_cnt,
                             lane_ok & (cur_s >= min_intv_p),
                             cur_k, cur_l, cur_s, x, cur_n)
    prev_k, prev_l, prev_s, prev_m, prev_n = bufs
    # prev_m was never set per-entry in the forward phase: all entries
    # share m = x (scatter wrote x already).

    # Physically reverse the valid prefix (longest-first order).
    ridx = jnp.clip(prev_cnt[:, None] - 1 - jnp.arange(P)[None, :], 0, P - 1)
    take2 = lambda arrb: jnp.take_along_axis(arrb, ridx, axis=1)
    prev_k, prev_l, prev_s = take2(prev_k), take2(prev_l), take2(prev_s)
    prev_m, prev_n = take2(prev_m), take2(prev_n)

    # ---------------- backward phase ----------------
    curr_k = jnp.zeros_like(prev_k)
    curr_l = jnp.zeros_like(prev_l)
    curr_s = jnp.zeros_like(prev_s)
    curr_m = jnp.zeros_like(prev_m)
    curr_n = jnp.zeros_like(prev_n)

    back_active = lane_ok & (prev_cnt > 0)

    def bwd_cond(st):
        u, back_active, *_ = st
        return jnp.any(back_active & (x - 1 - u >= 0))

    def bwd_body(st):
        (u, back_active, pk, pl, ps, pm, pn, pcnt,
         ck_, cl_, cs_, cm_, cn_, out) = st
        j = x - 1 - u
        a = codes[bidx, jnp.clip(j, 0, L - 1)]
        lane_step = back_active & (j >= 0)
        nbrk = a > 3
        work = lane_step & ~nbrk

        # inner scan over prev entries
        def p_cond(pst):
            p, *_ = pst
            return jnp.any(work & (p < pcnt))

        def p_body(pst):
            (p, phase, csmem, ccnt, ck, cl, cs, cm, cn, out) = pst
            inloop = work & (p < pcnt)
            pi = jnp.clip(p, 0, P - 1)
            sk = pk[bidx, pi]
            sl = pl[bidx, pi]
            ss = ps[bidx, pi]
            sm = pm[bidx, pi]
            sn = pn[bidx, pi]
            nk, nl, ns = _bwd_ext4(fmi, sk, sl, ss, jnp.clip(a, 0, 3))
            s_lt = ns < min_intv_p
            len_ok = (sn - sm + 1) >= min_seed_len
            emit = inloop & (phase == 0) & s_lt & len_ok
            keep = inloop & ~emit & ~s_lt & (ns != csmem)
            out = out.emit(emit, sm, sn, sk, sl, ss)
            idx = jnp.where(keep, ccnt, P)
            ck = ck.at[bidx, idx].set(nk, mode="drop")
            cl = cl.at[bidx, idx].set(nl, mode="drop")
            cs = cs.at[bidx, idx].set(ns, mode="drop")
            cm = cm.at[bidx, idx].set(j, mode="drop")
            cn = cn.at[bidx, idx].set(sn, mode="drop")
            ccnt = ccnt + keep.astype(jnp.int32)
            csmem = jnp.where(keep, ns, csmem)
            phase = jnp.where(emit | ((phase == 0) & keep), 1, phase)
            return (p + 1, phase, csmem, ccnt, ck, cl, cs, cm, cn, out)

        pst0 = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                jnp.full((B,), -1, dtype=pos_dtype),
                jnp.zeros((B,), jnp.int32),
                ck_, cl_, cs_, cm_, cn_, out)
        (_, _, _, ccnt, ck, cl, cs, cm, cn, out) = jax.lax.while_loop(
            p_cond, p_body, pst0)

        # swap prev <- curr for worked lanes
        w2 = work[:, None]
        pk = jnp.where(w2, ck, pk)
        pl = jnp.where(w2, cl, pl)
        ps = jnp.where(w2, cs, ps)
        pm = jnp.where(w2, cm, pm)
        pn = jnp.where(w2, cn, pn)
        pcnt = jnp.where(work, ccnt, pcnt)
        back_active = back_active & ~nbrk & jnp.where(work, ccnt > 0, True)
        return (u + 1, back_active, pk, pl, ps, pm, pn, pcnt,
                ck, cl, cs, cm, cn, out)

    st0 = (jnp.int32(0), back_active, prev_k, prev_l, prev_s, prev_m,
           prev_n, prev_cnt, curr_k, curr_l, curr_s, curr_m, curr_n, out)
    (_, _, prev_k, prev_l, prev_s, prev_m, prev_n, prev_cnt,
     *_rest, out) = jax.lax.while_loop(bwd_cond, bwd_body, st0)

    # Final emission of the longest surviving backward extension.
    fin = lane_ok & (prev_cnt > 0)
    f_m = prev_m[:, 0]
    f_n = prev_n[:, 0]
    fin = fin & ((f_n - f_m + 1) >= min_seed_len)
    out = out.emit(fin, f_m, f_n, prev_k[:, 0], prev_l[:, 0], prev_s[:, 0])
    return next_x, out


def smems_all_pos(fmi: DeviceFMIndex, codes, lens, min_intv,
                  min_seed_len: int, max_out: int):
    """Pass 1: all-position SMEM search for a batch. Returns SmemBuf."""
    B, L = codes.shape
    out = SmemBuf.empty(B, max_out, fmi.pos_dtype)
    x0 = jnp.zeros((B,), dtype=jnp.int32)

    def cond(st):
        x, out = st
        return jnp.any(x < lens)

    def body(st):
        x, out = st
        next_x, out = _one_pos(fmi, codes, lens, x, min_intv,
                               x < lens, min_seed_len, out)
        return next_x, out

    _, out = jax.lax.while_loop(cond, body, (x0, out))
    return out


def smems_reseed(fmi: DeviceFMIndex, codes, lens, pass1: SmemBuf,
                 split_len: int, split_width: int, min_seed_len: int,
                 max_out: int):
    """Pass 2: re-seed at midpoints of long low-occ pass-1 SMEMs."""
    B, L = codes.shape
    out = SmemBuf.empty(B, max_out, fmi.pos_dtype)
    M1 = pass1.m.shape[1]
    valid = jnp.arange(M1)[None, :] < pass1.cnt[:, None]
    cand = (valid
            & ((pass1.n + 1 - pass1.m) >= split_len)
            & (pass1.s <= split_width))
    n_cand = cand.sum(axis=1).astype(jnp.int32)
    csum = jnp.cumsum(cand.astype(jnp.int32), axis=1)
    bidx = jnp.arange(B)

    def cond(st):
        t, out = st
        return jnp.any(t < n_cand)

    def body(st):
        t, out = st
        has = t < n_cand
        # index of the t-th candidate per lane
        sel = jnp.argmax((csum == (t + 1)[:, None]) & cand, axis=1)
        m = pass1.m[bidx, sel]
        n = pass1.n[bidx, sel]
        s = pass1.s[bidx, sel]
        x = ((n + 1 + m) >> 1).astype(jnp.int32)
        min_intv = (s + 1).astype(jnp.int32)
        _, out = _one_pos(fmi, codes, lens, x, min_intv, has,
                          min_seed_len, out)
        return t + 1, out

    _, out = jax.lax.while_loop(cond, body, (jnp.zeros((B,), jnp.int32), out))
    return out


def smems_seed_strategy(fmi: DeviceFMIndex, codes, lens, max_intv: int,
                        min_seed_len: int, max_out: int):
    """Pass 3: forward-only scan emitting the first sub-max_intv seed
    (bwtSeedStrategyAllPosOneThread)."""
    B, L = codes.shape
    pos_dtype = fmi.pos_dtype
    out = SmemBuf.empty(B, max_out, pos_dtype)
    bidx = jnp.arange(B)
    max_intv_p = jnp.asarray(max_intv, dtype=pos_dtype)

    def outer_cond(st):
        x, out = st
        return jnp.any(x < lens)

    def outer_body(st):
        x, out = st
        a0 = codes[bidx, jnp.clip(x, 0, L - 1)]
        lane_ok = (x < lens) & (a0 < 4)
        next_x = x + 1
        a0c = jnp.clip(a0, 0, 3)
        ck = fmi.count[a0c]
        cl = fmi.count[3 - a0c]
        cs = fmi.count[a0c + 1] - fmi.count[a0c]
        cm = x

        def in_cond(ist):
            t, active, *_ = ist
            return jnp.any(active) & (t < L)

        def in_body(ist):
            (t, active, ck, cl, cs, nx, out) = ist
            j = x + t
            in_bounds = j < lens
            a = codes[bidx, jnp.clip(j, 0, L - 1)]
            step = active & in_bounds
            nx = jnp.where(step, j + 1, nx)
            do_ext = step & (a < 4)
            nk, nl, ns = _fwd_ext4(fmi, ck, cl, cs, jnp.clip(a, 0, 3))
            ck = jnp.where(do_ext, nk, ck)
            cl = jnp.where(do_ext, nl, cl)
            cs = jnp.where(do_ext, ns, cs)
            hit = do_ext & (ns < max_intv_p) & ((j - cm + 1) >= min_seed_len)
            out = out.emit(hit & (ns > 0), cm, j, nk, nl, ns)
            active = do_ext & ~hit
            return (t + 1, active, ck, cl, cs, nx, out)

        ist0 = (jnp.int32(1), lane_ok, ck, cl, cs, next_x, out)
        (_, _, _, _, _, next_x, out) = jax.lax.while_loop(
            in_cond, in_body, ist0)
        return next_x, out

    x0 = jnp.zeros((B,), dtype=jnp.int32)
    _, out = jax.lax.while_loop(outer_cond, outer_body, (x0, out))
    return out


def sort_smems(bufs: SmemBuf) -> SmemBuf:
    """Sort each read's SMEMs by (m, n) ascending; invalid entries last."""
    B, M = bufs.m.shape
    valid = jnp.arange(M)[None, :] < bufs.cnt[:, None]
    key = (bufs.m.astype(jnp.int64) << 32) | bufs.n.astype(jnp.int64)
    key = jnp.where(valid, key, jnp.int64(2 ** 62))
    order = jnp.argsort(key, axis=1)
    take = lambda arr: jnp.take_along_axis(arr, order, axis=1)
    return SmemBuf(take(bufs.m), take(bufs.n), take(bufs.k),
                   take(bufs.l), take(bufs.s), bufs.cnt)


def concat_smems(*bufs: SmemBuf) -> SmemBuf:
    """Concatenate SMEM buffers; each buffer's valid prefix is compacted
    by the final sort (invalid rows get the max key)."""
    return SmemBuf(
        jnp.concatenate([b.m for b in bufs], axis=1),
        jnp.concatenate([b.n for b in bufs], axis=1),
        jnp.concatenate([b.k for b in bufs], axis=1),
        jnp.concatenate([b.l for b in bufs], axis=1),
        jnp.concatenate([b.s for b in bufs], axis=1),
        sum(b.cnt for b in bufs),
    )


def collect_smems_device(fmi: DeviceFMIndex, codes, lens, *,
                         min_seed_len: int, split_len: int,
                         split_width: int, max_mem_intv: int,
                         max_out: int = None):
    """All three seeding passes + (m, n) sort. codes [B, L] int32.

    Returns a sorted SmemBuf whose valid entries mirror the reference's
    matchArray after mem_collect_smem.
    """
    B, L = codes.shape
    M = max_out or L
    ones = jnp.ones((B,), dtype=jnp.int32)
    p1 = smems_all_pos(fmi, codes, lens, ones, min_seed_len, M)
    p2 = smems_reseed(fmi, codes, lens, p1, split_len, split_width,
                      min_seed_len, M)
    if max_mem_intv > 0:
        p3 = smems_seed_strategy(fmi, codes, lens, max_mem_intv,
                                 min_seed_len + 1, M)
        combined = concat_smems(p1, p2, p3)
    else:
        combined = concat_smems(p1, p2)
    # Invalid rows must sort last: mark them via cnt-aware sort. Each
    # sub-buffer's invalid entries need the max key, so rebuild validity
    # from the sub-buffer counts before sorting.
    M1 = p1.m.shape[1]
    valid = jnp.concatenate(
        [jnp.arange(b.m.shape[1])[None, :] < b.cnt[:, None]
         for b in ((p1, p2, p3) if max_mem_intv > 0 else (p1, p2))],
        axis=1)
    key = ((combined.m.astype(jnp.int64) << 32)
           | combined.n.astype(jnp.int64))
    key = jnp.where(valid, key, jnp.int64(2 ** 62))
    order = jnp.argsort(key, axis=1)
    take = lambda arr: jnp.take_along_axis(arr, order, axis=1)
    return SmemBuf(take(combined.m), take(combined.n), take(combined.k),
                   take(combined.l), take(combined.s), combined.cnt)
