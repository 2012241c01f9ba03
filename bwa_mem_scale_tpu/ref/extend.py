"""Oracle seed-extension orchestration: chains -> alignment regions.

Sequential re-statement of the reference's batched extension orchestrator
(mem_chain2aln_across_reads_V2, src/bwamem.cpp:2810-3745): per chain,
compute the max reference span (rmax), fetch the reference window once,
process seeds best-score-first, and extend left/right with banded SW
under the MAX_BAND_TRY band-doubling retry policy.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..config import MemOptions, cal_max_gap
from .bsw import scalar_banded_swa
from .chain import Chain

MAX_BAND_TRY = 2


@dataclasses.dataclass
class AlnReg:
    rb: int = 0
    re: int = 0
    qb: int = 0
    qe: int = 0
    rid: int = -1
    score: int = -1
    truesc: int = -1
    sub: int = 0
    alt_sc: int = 0
    csub: int = 0
    sub_n: int = 0
    w: int = 0
    seedcov: int = 0
    secondary: int = -1
    secondary_all: int = -1
    seedlen0: int = 0
    n_comp: int = 1
    is_alt: bool = False
    frac_rep: float = 0.0
    hash: int = 0


def _band_try(query_ext, target_ext, h0, opt, pen_clip, prev_score):
    """Run the band-doubling retry loop; returns (accepted result, w used,
    score after the accepted try, prev-try score)."""
    a_score = prev_score
    for i in range(MAX_BAND_TRY):
        w = opt.w << i
        res = scalar_banded_swa(query_ext, target_ext, w, h0,
                                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                                opt.zdrop, opt.mat)
        prev = a_score
        a_score = res.score
        if (a_score == prev or res.max_off < (w >> 1) + (w >> 2)
                or i + 1 == MAX_BAND_TRY):
            return res, w, a_score
    return res, w, a_score  # unreachable


def chain2aln(opt: MemOptions, bns, ref_string: np.ndarray,
              query: np.ndarray, chains: List[Chain]) -> List[AlnReg]:
    l_query = len(query)
    l_pac = bns.l_pac
    regs: List[AlnReg] = []
    for c in chains:
        if c.n == 0:
            continue
        # Max possible reference span of this chain (src/bwamem.cpp:2892-2916).
        rmax0, rmax1 = l_pac << 1, 0
        for t in c.seeds:
            b = t.rbeg - (t.qbeg + int(cal_max_gap(opt, t.qbeg)))
            e = (t.rbeg + t.len
                 + (l_query - t.qbeg - t.len)
                 + int(cal_max_gap(opt, l_query - t.qbeg - t.len)))
            rmax0 = min(rmax0, b)
            rmax1 = max(rmax1, e)
        rmax0 = max(rmax0, 0)
        rmax1 = min(rmax1, l_pac << 1)
        if rmax0 < l_pac < rmax1:
            if c.seeds[0].rbeg < l_pac:
                rmax1 = l_pac
            else:
                rmax0 = l_pac
        rseq, rmax0, rmax1, rid = bns.fetch_seq(
            rmax0, c.seeds[0].rbeg, rmax1, ref_string)
        assert rid == c.rid

        # Seeds best-score-first; ties broken by larger original index
        # (srt = score<<32|i sorted ascending, consumed back-to-front).
        order = sorted(range(c.n),
                       key=lambda i: (c.seeds[i].score << 32) | i,
                       reverse=True)
        for si in order:
            s = c.seeds[si]
            a = AlnReg(rid=c.rid, frac_rep=c.frac_rep, seedlen0=s.len,
                       is_alt=c.is_alt, w=opt.w)
            # Left extension.
            if s.qbeg:
                qs = query[s.qbeg - 1::-1].copy()
                tmp = s.rbeg - rmax0
                rs = rseq[tmp - 1::-1].copy() if tmp > 0 else rseq[0:0]
                h0 = s.len * opt.a
                res, w, score = _band_try(qs, rs, h0, opt,
                                          opt.pen_clip5, -1)
                a.score = score
                if res.gscore <= 0 or res.gscore <= a.score - opt.pen_clip5:
                    a.qb = s.qbeg - res.qle
                    a.rb = s.rbeg - res.tle
                    a.truesc = a.score
                else:
                    a.qb = 0
                    a.rb = s.rbeg - res.gtle
                    a.truesc = res.gscore
                a.w = max(a.w, w)
            else:
                a.score = a.truesc = s.len * opt.a
                a.qb = 0
                a.rb = s.rbeg
            # Right extension.
            if s.qbeg + s.len != l_query:
                qe = s.qbeg + s.len
                re = s.rbeg + s.len - rmax0
                assert re >= 0
                qs = query[qe:]
                rs = rseq[re:]
                h0 = a.score
                res, w, score = _band_try(qs, rs, h0, opt,
                                          opt.pen_clip3, a.score)
                sc_prev = a.score
                a.score = score
                if res.gscore <= 0 or res.gscore <= a.score - opt.pen_clip3:
                    a.qe = qe + res.qle
                    a.re = rmax0 + re + res.tle
                    a.truesc += a.score - h0
                else:
                    a.qe = l_query
                    a.re = rmax0 + re + res.gtle
                    a.truesc += res.gscore - h0
                a.w = max(a.w, w)
            else:
                a.qe = l_query
                a.re = s.rbeg + s.len
            # Seed coverage over the final region.
            a.seedcov = 0
            for t in c.seeds:
                if (t.qbeg >= a.qb and t.qbeg + t.len <= a.qe
                        and t.rbeg >= a.rb and t.rbeg + t.len <= a.re):
                    a.seedcov += t.len
            regs.append(a)
    # Drop zero-width regions (mem_kernel2_core tail, src/bwamem.cpp:1446-1460).
    return [a for a in regs if a.qe > a.qb]
