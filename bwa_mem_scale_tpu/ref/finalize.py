"""Oracle finalization: dedup/patch, primary marking, MAPQ, SAM records.

Ports:
- mem_patch_reg / mem_sort_dedup_patch: src/bwamem.cpp:198-375
- mem_mark_primary_se (+ _core): src/bwamem.cpp:1905-1977
- mem_approx_mapq_se: src/bwamem.cpp:1983-2007
- mem_reg2aln: src/bwamem.cpp:2533-2624
- mem_gen_alt (XA): src/bwamem_extra.cpp:130-183
- mem_reg2sam selection: src/bwamem.cpp:2092-2150
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from ..config import (MemOptions, MEM_F_ALL, MEM_F_NO_MULTI,
                      MEM_F_KEEP_SUPP_MAPQ, MEM_MAPQ_COEF)
from .extend import AlnReg
from . import ksw

PATCH_MAX_R_BW = 0.05
PATCH_MIN_SC_RATIO = 0.90


def hash_64(key: int) -> int:
    """Thomas Wang 64-bit mix used for deterministic tie-breaking
    (src/utils.h:117-128)."""
    mask = (1 << 64) - 1
    key = (key + (~(key << 32) & mask)) & mask
    key ^= key >> 22
    key = (key + (~(key << 13) & mask)) & mask
    key ^= key >> 8
    key = (key + (key << 3)) & mask
    key ^= key >> 15
    key = (key + (~(key << 27) & mask)) & mask
    key ^= key >> 31
    return key


def patch_reg(opt: MemOptions, bns, ref_string, query,
              a: AlnReg, b: AlnReg) -> Tuple[int, int]:
    """Try to merge colinear hits a (left) and b; returns (score, w) or
    (0, _) if not mergeable."""
    assert a.rid == b.rid and a.rb <= b.rb
    if a.rb < bns.l_pac and b.rb >= bns.l_pac:
        return 0, 0
    if a.qb >= b.qb or a.qe >= b.qe or a.re >= b.re:
        return 0, 0
    w = abs((a.re - b.rb) - (a.qe - b.qb))
    r = abs((a.re - b.rb) / (b.re - a.rb) - (a.qe - b.qb) / (b.qe - a.qb))
    if a.re < b.rb or a.qe < b.qb:
        if w > opt.w << 1 or r >= PATCH_MAX_R_BW:
            return 0, 0
    elif w > opt.w << 2 or r >= PATCH_MAX_R_BW * 2:
        return 0, 0
    w += a.w + b.w
    w = min(w, opt.w << 2)
    _, score, _, _ = ksw.gen_cigar_w(opt, w, bns.l_pac, ref_string,
                                     query[a.qb:b.qe], a.rb, b.re)
    q_s = int((b.qe - a.qb) / ((b.qe - b.qb) + (a.qe - a.qb))
              * (b.score + a.score) + 0.499)
    r_s = int((b.re - a.rb) / ((b.re - b.rb) + (a.re - a.rb))
              * (b.score + a.score) + 0.499)
    if score / max(q_s, r_s) < PATCH_MIN_SC_RATIO:
        return 0, 0
    return score, w


def sort_dedup_patch(opt: MemOptions, bns, ref_string, query,
                     regs: List[AlnReg]) -> List[AlnReg]:
    n = len(regs)
    if n <= 1:
        return regs
    a = sorted(regs, key=lambda r: r.re)  # sort by END position
    for r in a:
        r.n_comp = 1
    for i in range(1, len(a)):
        p = a[i]
        if p.rid != a[i - 1].rid or p.rb >= a[i - 1].re + opt.max_chain_gap:
            continue
        j = i - 1
        while (j >= 0 and p.rid == a[j].rid
               and p.rb < a[j].re + opt.max_chain_gap):
            q = a[j]
            j -= 1
            if q.qe == q.qb:
                continue
            or_ = q.re - p.rb
            oq = (q.qe - p.qb) if q.qb < p.qb else (p.qe - q.qb)
            mr = min(q.re - q.rb, p.re - p.rb)
            mq = min(q.qe - q.qb, p.qe - p.qb)
            if or_ > opt.mask_level_redun * mr and oq > opt.mask_level_redun * mq:
                if p.score < q.score:
                    p.qe = p.qb
                    break
                else:
                    q.qe = q.qb
            elif q.rb < p.rb:
                # patching disabled when called without reference/query
                # (mem_patch_reg returns 0 then, src/bwamem.cpp:206)
                score, w = (patch_reg(opt, bns, ref_string, query, q, p)
                            if bns is not None else (0, 0))
                if score > 0:
                    p.n_comp += q.n_comp + 1
                    p.seedcov = max(p.seedcov, q.seedcov)
                    p.sub = max(p.sub, q.sub)
                    p.csub = max(p.csub, q.csub)
                    p.qb, p.rb = q.qb, q.rb
                    p.truesc = p.score = score
                    p.w = w
                    q.qb = q.qe
    a = [r for r in a if r.qe > r.qb]
    # Sort by score desc, then rb, then qb (alnreg_slt).
    a.sort(key=lambda r: (-r.score, r.rb, r.qb))
    for i in range(1, len(a)):
        if (a[i].score == a[i - 1].score and a[i].rb == a[i - 1].rb
                and a[i].qb == a[i - 1].qb):
            a[i].qe = a[i].qb
    return [r for i, r in enumerate(a) if r.qe > r.qb]


def _mark_primary_core(opt: MemOptions, a: List[AlnReg]) -> None:
    tmp = max(opt.a + opt.b, opt.o_del + opt.e_del, opt.o_ins + opt.e_ins)
    z = [0]
    for i in range(1, len(a)):
        found = -1
        for k in z:
            b_max = max(a[k].qb, a[i].qb)
            e_min = min(a[k].qe, a[i].qe)
            if e_min > b_max:
                min_l = min(a[i].qe - a[i].qb, a[k].qe - a[k].qb)
                if e_min - b_max >= min_l * opt.mask_level:
                    if a[k].sub == 0:
                        a[k].sub = a[i].score
                    if (a[k].score - a[i].score <= tmp
                            and (a[k].is_alt or not a[i].is_alt)):
                        a[k].sub_n += 1
                    found = k
                    break
        if found < 0:
            z.append(i)
        else:
            a[i].secondary = found


def mark_primary(opt: MemOptions, regs: List[AlnReg], read_id: int
                 ) -> Tuple[List[AlnReg], int]:
    """mem_mark_primary_se. Sorts regs and sets secondary/secondary_all;
    returns (sorted regs, n_pri)."""
    n = len(regs)
    if n == 0:
        return regs, 0
    n_pri = 0
    for i, r in enumerate(regs):
        r.sub = r.alt_sc = 0
        r.secondary = r.secondary_all = -1
        r.hash = hash_64((read_id + i) & ((1 << 64) - 1))
        if not r.is_alt:
            n_pri += 1
    # Sort by score desc, alt asc, hash asc (alnreg_hlt).
    regs = sorted(regs, key=lambda r: (-r.score, r.is_alt, r.hash))
    _mark_primary_core(opt, regs)
    for i, p in enumerate(regs):
        p.secondary_all = i  # rank in the first round
        if not p.is_alt and p.secondary >= 0 and regs[p.secondary].is_alt:
            p.alt_sc = regs[p.secondary].score
    if n_pri < n:
        if n_pri > 0:
            # Re-sort: alt last (alnreg_hlt2).
            regs = sorted(regs, key=lambda r: (r.is_alt, -r.score, r.hash))
        z = [0] * n
        for i, r in enumerate(regs):
            z[r.secondary_all] = i
        for r in regs:
            if r.secondary >= 0:
                r.secondary_all = z[r.secondary]
                if r.is_alt:
                    r.secondary = (1 << 31) - 1
            else:
                r.secondary_all = -1
        if n_pri > 0:
            for i in range(n_pri):
                regs[i].sub = 0
                regs[i].secondary = -1
            _mark_primary_core(opt, regs[:n_pri])
    else:
        for r in regs:
            r.secondary_all = r.secondary
    return regs, n_pri


def reorder_primary5(T: int, regs: List[AlnReg]) -> None:
    """-5: make the leftmost-on-query primary hit the first record
    (mem_reorder_primary5, src/bwamem.cpp:2009-2032)."""
    n_pri = sum(1 for r in regs
                if r.secondary < 0 and not r.is_alt and r.score >= T)
    if n_pri <= 1:
        return
    left_st, left_k = 1 << 30, -1
    for k, r in enumerate(regs):
        if r.secondary >= 0 or r.is_alt or r.score < T:
            continue
        if r.qb < left_st:
            left_st, left_k = r.qb, k
    if left_k <= 0:
        return
    regs[0], regs[left_k] = regs[left_k], regs[0]
    for k in range(1, len(regs)):
        r = regs[k]
        if r.secondary == 0:
            r.secondary = left_k
        elif r.secondary == left_k:
            r.secondary = 0
        if r.secondary_all == 0:
            r.secondary_all = left_k
        elif r.secondary_all == left_k:
            r.secondary_all = 0


def approx_mapq(opt: MemOptions, a: AlnReg) -> int:
    sub = a.sub if a.sub else opt.min_seed_len * opt.a
    sub = max(a.csub, sub)
    if sub >= a.score:
        return 0
    l = max(a.qe - a.qb, a.re - a.rb)
    identity = 1.0 - (l * opt.a - a.score) / (opt.a + opt.b) / l
    if a.score == 0:
        mapq = 0
    elif opt.mapQ_coef_len > 0:
        tmp = 1.0 if l < opt.mapQ_coef_len else opt.mapQ_coef_fac / math.log(l)
        tmp *= identity * identity
        mapq = int(6.02 * (a.score - sub) / opt.a * tmp * tmp + 0.499)
    else:
        mapq = int(MEM_MAPQ_COEF * (1.0 - sub / a.score)
                   * math.log(a.seedcov) + 0.499)
        if identity < 0.95:
            mapq = int(mapq * identity * identity + 0.499)
    if a.sub_n > 0:
        mapq -= int(4.343 * math.log(a.sub_n + 1) + 0.499)
    mapq = min(mapq, 60)
    mapq = max(mapq, 0)
    return int(mapq * (1.0 - a.frac_rep) + 0.499)


@dataclasses.dataclass
class Aln:
    """Final per-record alignment (mem_aln_t)."""
    pos: int = -1
    rid: int = -1
    flag: int = 0
    is_rev: bool = False
    is_alt: bool = False
    mapq: int = 0
    NM: int = -1
    cigar: Optional[list] = None   # [(len, op)]
    MD: str = ""
    score: int = -1
    sub: int = -1
    alt_sc: int = 0
    XA: Optional[str] = None


def _infer_bw(l1: int, l2: int, score: int, a: int, q: int, r: int) -> int:
    if l1 == l2 and l1 * a - score < (q + r - a) << 1:
        return 0
    w = int((min(l1, l2) * a - score - q) / r + 2.0)
    return max(w, abs(l1 - l2))


def reg2aln(opt: MemOptions, bns, ref_string, l_query: int,
            query: np.ndarray, ar: Optional[AlnReg]) -> Aln:
    a = Aln()
    if ar is None or ar.rb < 0 or ar.re < 0:
        a.rid = -1
        a.pos = -1
        a.flag |= 0x4
        return a
    qb, qe = ar.qb, ar.qe
    rb, re = ar.rb, ar.re
    a.mapq = approx_mapq(opt, ar) if ar.secondary < 0 else 0
    if ar.secondary >= 0:
        a.flag |= 0x100
    w2 = max(_infer_bw(qe - qb, re - rb, ar.truesc, opt.a,
                       opt.o_del, opt.e_del),
             _infer_bw(qe - qb, re - rb, ar.truesc, opt.a,
                       opt.o_ins, opt.e_ins))
    if w2 > opt.w:
        w2 = min(w2, ar.w)
    last_sc = -(1 << 30)
    i = 0
    cigar = None
    while True:
        w2 = min(w2, opt.w << 2)
        cigar, score, nm, md = ksw.gen_cigar_w(
            opt, w2, bns.l_pac, ref_string, query[qb:qe], rb, re)
        if score == last_sc or w2 == opt.w << 2:
            break
        last_sc = score
        w2 <<= 1
        i += 1
        if not (i < 3 and score < ar.truesc - opt.a):
            break
    a.NM = nm
    a.MD = md
    pos_f, is_rev = bns.depos(np.int64(rb if rb < bns.l_pac else re - 1))
    pos = int(pos_f)
    a.is_rev = bool(is_rev)
    if cigar and len(cigar) > 0:
        # Squeeze out leading/trailing deletions.
        if cigar[0][1] == 2:
            pos += cigar[0][0]
            cigar = cigar[1:]
        elif cigar[-1][1] == 2:
            cigar = cigar[:-1]
    if qb != 0 or qe != l_query:
        clip5 = l_query - qe if a.is_rev else qb
        clip3 = qb if a.is_rev else l_query - qe
        if clip5:
            cigar = [(clip5, 3)] + cigar
        if clip3:
            cigar = cigar + [(clip3, 3)]
    a.cigar = cigar
    a.rid = int(bns.pos2rid(np.int64(pos)))
    assert a.rid == ar.rid, (a.rid, ar.rid)
    a.pos = pos - bns.anns[a.rid].offset
    a.score = ar.score
    a.sub = max(ar.sub, ar.csub)
    a.is_alt = ar.is_alt
    a.alt_sc = ar.alt_sc
    return a


def gen_alt(opt: MemOptions, bns, ref_string, regs: List[AlnReg],
            l_query: int, query: np.ndarray) -> Optional[List[str]]:
    """XA-tag strings per region (mem_gen_alt); requires mark_primary."""
    def pri_idx(i):
        k = regs[i].secondary_all
        if k >= 0 and regs[i].score >= regs[k].score * opt.XA_drop_ratio:
            return k
        return -1

    n = len(regs)
    cnt = [0] * n
    has_alt = [False] * n
    tot = 0
    for i in range(n):
        r = pri_idx(i)
        if r >= 0:
            cnt[r] += 1
            tot += 1
            if regs[i].is_alt:
                has_alt[r] = True
    if tot == 0:
        return None
    aln = [""] * n
    for i in range(n):
        r = pri_idx(i)
        if r < 0:
            continue
        if cnt[r] > opt.max_XA_hits_alt or (not has_alt[r]
                                            and cnt[r] > opt.max_XA_hits):
            continue
        t = reg2aln(opt, bns, ref_string, l_query, query, regs[i])
        parts = [bns.anns[t.rid].name, ",",
                 "-" if t.is_rev else "+", str(t.pos + 1), ","]
        for (ln, op) in (t.cigar or []):
            parts.append(f"{ln}{'MIDSHN'[op]}")
        parts.append(f",{t.NM};")
        aln[r] += "".join(parts)
    return aln


def reg2sam_records(opt: MemOptions, bns, ref_string, query: np.ndarray,
                    regs: List[AlnReg], extra_flag: int = 0
                    ) -> List[Aln]:
    """Select output regions and convert each to an Aln record
    (mem_reg2sam without the text formatting)."""
    l_query = len(query)
    XA = None
    if not (opt.flag & MEM_F_ALL):
        XA = gen_alt(opt, bns, ref_string, regs, l_query, query)
    out: List[Aln] = []
    l = 0
    for k, p in enumerate(regs):
        if p.score < opt.T:
            continue
        if p.secondary >= 0 and (p.is_alt or not (opt.flag & MEM_F_ALL)):
            continue
        if (0 <= p.secondary < (1 << 31) - 1
                and p.score < regs[p.secondary].score * opt.drop_ratio):
            continue
        q = reg2aln(opt, bns, ref_string, l_query, query, p)
        q.XA = XA[k] if XA else None
        q.flag |= extra_flag
        if p.secondary >= 0:
            q.sub = -1
        if l and p.secondary < 0:
            q.flag |= 0x10000 if (opt.flag & MEM_F_NO_MULTI) else 0x800
        if (not (opt.flag & MEM_F_KEEP_SUPP_MAPQ) and l
                and not p.is_alt and q.mapq > out[0].mapq):
            q.mapq = out[0].mapq
        l += 1
        out.append(q)
    if not out:
        t = reg2aln(opt, bns, ref_string, l_query, query, None)
        t.flag |= extra_flag
        out.append(t)
    return out
