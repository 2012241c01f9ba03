"""Oracle banded global alignment with traceback (CIGAR generation).

Port of the reference's ksw_global2 (src/ksw.cpp:558-672) and the CIGAR /
NM / MD wrapper bwa_gen_cigar2 (src/bwa.cpp:380-470).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

MINUS_INF = -0x40000000

# CIGAR op codes: 0=M 1=I 2=D 3=S 4=H (SAM order "MIDSH" as in the reference).
CIGAR_STR = "MIDSH"


def ksw_global(query: np.ndarray, target: np.ndarray, mat: np.ndarray,
               o_del: int, e_del: int, o_ins: int, e_ins: int, w: int,
               want_cigar: bool = True
               ) -> Tuple[int, Optional[List[Tuple[int, int]]]]:
    """Banded global alignment. Returns (score, cigar) with cigar a list of
    (length, op) pairs, or None when want_cigar is False."""
    qlen, tlen = len(query), len(target)
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    n_col = min(qlen, 2 * w + 1)

    qp = mat[:, query].astype(np.int64)    # query profile [m, qlen]
    eh_h = np.full(qlen + 2, MINUS_INF, dtype=np.int64)
    eh_e = np.full(qlen + 2, MINUS_INF, dtype=np.int64)
    eh_h[0] = 0
    for j in range(1, min(qlen, w) + 1):
        eh_h[j] = -(o_ins + e_ins * j)

    z = np.zeros((tlen, n_col), dtype=np.uint8) if want_cigar else None

    for i in range(tlen):
        f = MINUS_INF
        q = qp[target[i]]
        beg = i - w if i > w else 0
        end = i + w + 1 if i + w + 1 < qlen else qlen
        h1 = -(o_del + e_del * (i + 1)) if beg == 0 else MINUS_INF
        for j in range(beg, end):
            m = int(eh_h[j])
            e = int(eh_e[j])
            eh_h[j] = h1
            m += int(q[j])
            d = 0 if m >= e else 1
            h = m if m >= e else e
            if h < f:
                d = 2
                h = f
            h1 = h
            t = m - oe_del
            e -= e_del
            if e > t:
                d |= 1 << 2
            else:
                e = t
            eh_e[j] = e
            t = m - oe_ins
            f -= e_ins
            if f > t:
                d |= 2 << 4
            else:
                f = t
            if want_cigar:
                z[i, j - beg] = d
        eh_h[end] = h1
        eh_e[end] = MINUS_INF

    score = int(eh_h[qlen])
    if not want_cigar:
        return score, None

    # Traceback.
    cigar: List[Tuple[int, int]] = []

    def push(op: int, length: int):
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + length, op)
        else:
            cigar.append((length, op))

    i = tlen - 1
    k = (i + w + 1 if i + w + 1 < qlen else qlen) - 1
    which = 0
    while i >= 0 and k >= 0:
        beg = i - w if i > w else 0
        which = (int(z[i, k - beg]) >> (which << 1)) & 3
        if which == 0:
            push(0, 1)
            i -= 1
            k -= 1
        elif which == 1:
            push(2, 1)
            i -= 1
        else:
            push(1, 1)
            k -= 1
    if i >= 0:
        push(2, i + 1)
    if k >= 0:
        push(1, k + 1)
    cigar.reverse()
    return score, cigar


def gen_cigar(opt, l_pac: int, ref_string: np.ndarray, query: np.ndarray,
              rb: int, re: int
              ) -> Tuple[Optional[List[Tuple[int, int]]], int, int, str]:
    """Generate (cigar, score, NM, MD) for a located alignment
    (bwa_gen_cigar2 semantics, src/bwa.cpp:380-470).

    `query` is the nt4-encoded slice query[qb:qe]; rb/re are [0, 2*l_pac)
    coordinates. Sequences on the reverse strand are flipped so that
    indels are left-aligned on the forward strand.
    """
    l_query = len(query)
    if l_query <= 0 or rb >= re or (rb < l_pac and re > l_pac):
        return None, 0, -1, ""
    rseq = np.array(ref_string[rb:re], copy=True)
    query = np.array(query, copy=True)
    if rb >= l_pac:
        query = query[::-1]
        rseq = rseq[::-1]
    rlen = len(rseq)
    mat = opt.mat

    if l_query == re - rb and opt.w == 0:
        cigar = [(l_query, 0)]
        score = int(sum(int(mat[rseq[i], query[i]]) for i in range(l_query)))
    else:
        max_ins = int((((l_query + 1) >> 1) * int(mat[0, 0]) - opt.o_ins)
                      / opt.e_ins + 1.0)
        max_del = int((((l_query + 1) >> 1) * int(mat[0, 0]) - opt.o_del)
                      / opt.e_del + 1.0)
        max_gap = max(max(max_ins, max_del), 1)
        w = (max_gap + abs(rlen - l_query) + 1) >> 1
        w = min(w, opt.w)
        min_w = abs(rlen - l_query) + 3
        w = max(w, min_w)
        score, cigar = ksw_global(query, rseq, mat, opt.o_del, opt.e_del,
                                  opt.o_ins, opt.e_ins, w)

    nm, md = compute_nm_md(cigar, query, rseq, rb < l_pac)
    return cigar, score, nm, md


def gen_cigar_w(opt, w2: int, l_pac: int, ref_string: np.ndarray,
                query: np.ndarray, rb: int, re: int):
    """gen_cigar with an explicit band override (mem_reg2aln's w2 loop)."""
    class _O:  # narrow adapter: same scoring, overridden w
        pass
    o = _O()
    o.mat = opt.mat
    o.o_del, o.e_del = opt.o_del, opt.e_del
    o.o_ins, o.e_ins = opt.o_ins, opt.e_ins
    o.w = w2
    return gen_cigar(o, l_pac, ref_string, query, rb, re)


def compute_nm_md(cigar, query: np.ndarray, rseq: np.ndarray,
                  is_fw: bool) -> Tuple[int, str]:
    """NM and MD-tag computation over an alignment (src/bwa.cpp:430-458)."""
    if cigar is None:
        return -1, ""
    int2base = "ACGTN" if is_fw else "TGCAN"
    md: List[str] = []
    x = y = u = 0
    n_mm = n_gap = 0
    n_cigar = len(cigar)
    for kk, (length, op) in enumerate(cigar):
        if op == 0:
            for i in range(length):
                if query[x + i] != rseq[y + i]:
                    md.append(str(u))
                    md.append(int2base[rseq[y + i]])
                    n_mm += 1
                    u = 0
                else:
                    u += 1
            x += length
            y += length
        elif op == 2:
            if 0 < kk < n_cigar - 1:
                md.append(str(u))
                md.append("^")
                md.append("".join(int2base[rseq[y + i]] for i in range(length)))
                u = 0
                n_gap += length
            y += length
        elif op == 1:
            x += length
            n_gap += length
    md.append(str(u))
    return n_mm + n_gap, "".join(md)


def cigar_qlen(cigar) -> int:
    return sum(l for l, op in cigar if op in (0, 1, 3))


def cigar_rlen(cigar) -> int:
    return sum(l for l, op in cigar if op in (0, 2))


def cigar_string(cigar) -> str:
    if not cigar:
        return "*"
    return "".join(f"{l}{CIGAR_STR[op]}" for l, op in cigar)
