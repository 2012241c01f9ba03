"""Oracle seed chaining and chain filtering.

Ports:
- test_and_merge: src/bwamem.cpp:379-421
- mem_chain_seeds (B-tree chaining over SA-expanded seeds):
  src/bwamem.cpp:789-960
- mem_chain_weight: src/bwamem.cpp:452-471
- mem_chain_flt: src/bwamem.cpp:528-646
- mem_flt_chained_seeds / mem_seed_sw: src/bwamem.cpp:423-527
"""

from __future__ import annotations

import bisect
import dataclasses
import math
from typing import List

import numpy as np

from .fm import FMOracle, Smem

MEM_SHORT_EXT = 50
MEM_SHORT_LEN = 200
MEM_HSP_COEF = 1.1
MEM_MINSC_COEF = 5.5
MEM_SEEDSW_COEF = 0.05


@dataclasses.dataclass
class Seed:
    rbeg: int
    qbeg: int
    len: int
    score: int


@dataclasses.dataclass
class Chain:
    pos: int                 # key: rbeg of first seed
    rid: int
    seqid: int
    is_alt: bool
    seeds: List[Seed]
    frac_rep: float = 0.0
    w: int = 0
    kept: int = 0
    first: int = -1

    @property
    def n(self) -> int:
        return len(self.seeds)

    @property
    def qbeg(self) -> int:
        return self.seeds[0].qbeg

    @property
    def qend(self) -> int:
        return self.seeds[-1].qbeg + self.seeds[-1].len


def test_and_merge(opt, l_pac: int, c: Chain, p: Seed, seed_rid: int) -> bool:
    last = c.seeds[-1]
    qend = last.qbeg + last.len
    rend = last.rbeg + last.len
    if seed_rid != c.rid:
        return False
    if (p.qbeg >= c.seeds[0].qbeg and p.qbeg + p.len <= qend
            and p.rbeg >= c.seeds[0].rbeg and p.rbeg + p.len <= rend):
        return True  # contained seed; do nothing
    if (last.rbeg < l_pac or c.seeds[0].rbeg < l_pac) and p.rbeg >= l_pac:
        return False  # different strand
    x = p.qbeg - last.qbeg
    y = p.rbeg - last.rbeg
    if (y >= 0 and x - y <= opt.w and y - x <= opt.w
            and x - last.len < opt.max_chain_gap
            and y - last.len < opt.max_chain_gap):
        c.seeds.append(p)
        return True
    return False


def chain_seeds(fm: FMOracle, opt, bns, query: np.ndarray, seqid: int,
                smems: List[Smem]) -> List[Chain]:
    """SMEMs -> SA coordinates -> colinearly merged chains, key-sorted."""
    l_pac = bns.l_pac
    if len(query) < opt.min_seed_len or not smems:
        return []

    # frac_rep: fraction of the read covered by over-occurring SMEMs
    # (scanned in (m, n)-sorted order).
    b = e = l_rep = 0
    for p in smems:
        sb, se = p.m, p.n + 1
        if p.s <= opt.max_occ:
            continue
        if sb > e:
            l_rep += e - b
            b, e = sb, se
        else:
            e = max(e, se)
    l_rep += e - b

    keys: List[int] = []      # sorted chain keys
    chains: List[Chain] = []  # parallel to keys
    for p in smems:
        slen = p.n + 1 - p.m
        for rbeg in fm.sa_entries(p, opt.max_occ):
            s = Seed(rbeg=rbeg, qbeg=p.m, len=slen, score=slen)
            rid = int(bns.intv2rid(np.int64(s.rbeg),
                                   np.int64(s.rbeg + s.len)))
            if rid < 0:
                continue
            to_add = False
            if keys:
                # lower = chain with the largest key <= seed rbeg.
                i = bisect.bisect_right(keys, s.rbeg) - 1
                if i < 0 or not test_and_merge(opt, l_pac, chains[i], s, rid):
                    to_add = True
            else:
                to_add = True
            if to_add:
                c = Chain(pos=s.rbeg, rid=rid, seqid=seqid,
                          is_alt=bool(bns.anns[rid].is_alt), seeds=[s])
                i = bisect.bisect_left(keys, s.rbeg)
                keys.insert(i, s.rbeg)
                chains.insert(i, c)
    frac_rep = l_rep / len(query)
    for c in chains:
        c.frac_rep = frac_rep
    return chains


def chain_weight(c: Chain) -> int:
    w = 0
    end = 0
    for s in c.seeds:
        if s.qbeg >= end:
            w += s.len
        elif s.qbeg + s.len > end:
            w += s.qbeg + s.len - end
        end = max(end, s.qbeg + s.len)
    tmp = w
    w = 0
    end = 0
    for s in c.seeds:
        if s.rbeg >= end:
            w += s.len
        elif s.rbeg + s.len > end:
            w += s.rbeg + s.len - end
        end = max(end, s.rbeg + s.len)
    w = min(w, tmp)
    return min(w, (1 << 30) - 1)


def chain_flt(opt, chains: List[Chain]) -> List[Chain]:
    """Drop light / heavily-shadowed chains (mem_chain_flt for a single
    read; the reference batches multiple reads through one call)."""
    if not chains:
        return []
    a = []
    for c in chains:
        c.first = -1
        c.kept = 0
        c.w = chain_weight(c)
        if c.w >= opt.min_chain_weight:
            a.append(c)
    if not a:
        return []
    # Sort by weight descending (ks_introsort(mem_flt): (a).w > (b).w).
    a.sort(key=lambda c: -c.w)
    kept_idx = [0]
    a[0].kept = 3
    for i in range(1, len(a)):
        large_ovlp = False
        stopped = False
        for j in kept_idx:
            b_max = max(a[j].qbeg, a[i].qbeg)
            e_min = min(a[j].qend, a[i].qend)
            if e_min > b_max and (not a[j].is_alt or a[i].is_alt):
                li = a[i].qend - a[i].qbeg
                lj = a[j].qend - a[j].qbeg
                min_l = min(li, lj)
                if (e_min - b_max >= min_l * opt.mask_level
                        and min_l < opt.max_chain_gap):
                    large_ovlp = True
                    if a[j].first < 0:
                        a[j].first = i
                    if (a[i].w < a[j].w * opt.drop_ratio
                            and a[j].w - a[i].w >= opt.min_seed_len << 1):
                        stopped = True
                        break
        if not stopped:
            kept_idx.append(i)
            a[i].kept = 2 if large_ovlp else 3
    for j in kept_idx:
        if a[j].first >= 0:
            a[a[j].first].kept = 1
    # Cap the number of .kept=1/2 chains to extend.
    k = 0
    for i, c in enumerate(a):
        if c.kept == 0 or c.kept == 3:
            continue
        k += 1
        if k >= opt.max_chain_extend:
            for c2 in a[i + 1:]:
                if c2.kept < 3:
                    c2.kept = 0
            break
    return [c for c in a if c.kept != 0]


def _local_sw_score(query: np.ndarray, target: np.ndarray,
                    mat: np.ndarray, o_del: int, e_del: int,
                    o_ins: int, e_ins: int) -> int:
    """Plain affine local SW max score (ksw_align2 score semantics)."""
    qlen, tlen = len(query), len(target)
    H = np.zeros(qlen + 1, dtype=np.int64)
    E = np.zeros(qlen + 1, dtype=np.int64)
    best = 0
    for i in range(tlen):
        f = 0
        h_diag = 0
        prof = mat[target[i]]
        for j in range(1, qlen + 1):
            m = h_diag + int(prof[query[j - 1]])
            h_diag = int(H[j])
            e = int(E[j])
            h = max(m, e, f, 0)
            H[j] = h
            best = max(best, h)
            E[j] = max(m - o_del - e_del, e - e_del, 0)
            f = max(m - o_ins - e_ins, f - e_ins, 0)
    return int(best)


def seed_sw_score(opt, bns, ref_string: np.ndarray, query: np.ndarray,
                  s: Seed) -> int:
    """mem_seed_sw: local SW around a short seed; -1 = 'good enough'."""
    l_query = len(query)
    l_pac = bns.l_pac
    if s.len >= MEM_SHORT_LEN:
        return -1
    qb, qe = s.qbeg, s.qbeg + s.len
    rb, re = s.rbeg, s.rbeg + s.len
    mid = (rb + re) >> 1
    qb = max(qb - MEM_SHORT_EXT, 0)
    qe = min(qe + MEM_SHORT_EXT, l_query)
    rb = max(rb - MEM_SHORT_EXT, 0)
    re = min(re + MEM_SHORT_EXT, l_pac << 1)
    if rb < l_pac < re:
        if mid < l_pac:
            re = l_pac
        else:
            rb = l_pac
    if qe - qb >= MEM_SHORT_LEN or re - rb >= MEM_SHORT_LEN:
        return -1
    rseq, rb, re, _ = bns.fetch_seq(rb, mid, re, ref_string)
    return _local_sw_score(query[qb:qe], rseq, opt.mat.astype(np.int64),
                           opt.o_del, opt.e_del, opt.o_ins, opt.e_ins)


def flt_chained_seeds(opt, bns, ref_string: np.ndarray, query: np.ndarray,
                      chains: List[Chain]) -> None:
    """mem_flt_chained_seeds: SW-validate seeds of each chain. With the
    default scoring this is skipped whenever min_l > 0.05 * l_query, i.e.
    for all short reads."""
    l_query = len(query)
    for c in chains:
        min_l = (MEM_HSP_COEF * opt.min_chain_weight if opt.min_chain_weight
                 else MEM_MINSC_COEF * math.log(l_query))
        min_hsp_score = int(opt.a * min_l + 0.499)
        if min_l > MEM_SEEDSW_COEF * l_query:
            continue
        kept = []
        for s in c.seeds:
            s.score = seed_sw_score(opt, bns, ref_string, query, s)
            if s.score < 0 or s.score >= min_hsp_score:
                s.score = s.len * opt.a if s.score < 0 else s.score
                kept.append(s)
        c.seeds = kept
