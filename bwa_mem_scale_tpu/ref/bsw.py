"""Oracle banded Smith-Waterman extension kernel.

Bit-exact port of the reference's scalar extension DP
(scalarBandedSWA, src/bandedSWA.cpp:116-238): banded affine-gap local
extension seeded with h0, returning
(score, qle, tle, gtle, gscore, max_off) with z-drop early exit and
adaptive per-row band shrinking.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BswResult:
    score: int
    qle: int     # query extension length at max score
    tle: int     # target extension length at max score
    gtle: int    # target length at best to-query-end score
    gscore: int  # best score reaching the query end
    max_off: int # max band offset touched (drives band-doubling retries)


def scalar_banded_swa(query: np.ndarray, target: np.ndarray, w: int, h0: int,
                      o_del: int, e_del: int, o_ins: int, e_ins: int,
                      zdrop: int, mat: np.ndarray, end_bonus: int = 0
                      ) -> BswResult:
    qlen, tlen = len(query), len(target)
    m = mat.shape[0]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins

    # Query profile.
    qp = mat[:, query].astype(np.int64)  # [m, qlen]

    eh_h = np.zeros(qlen + 2, dtype=np.int64)
    eh_e = np.zeros(qlen + 2, dtype=np.int64)
    eh_h[0] = h0
    eh_h[1] = h0 - oe_ins if h0 > oe_ins else 0
    j = 2
    while j <= qlen and eh_h[j - 1] > e_ins:
        eh_h[j] = eh_h[j - 1] - e_ins
        j += 1

    # Clamp w to the max feasible gap count.
    mx = int(mat.max())
    max_ins = int((qlen * mx + end_bonus - o_ins) / e_ins + 1.0)
    max_ins = max(max_ins, 1)
    w = min(w, max_ins)
    max_del = int((qlen * mx + end_bonus - o_del) / e_del + 1.0)
    max_del = max(max_del, 1)
    w = min(w, max_del)

    max_score, max_i, max_j = h0, -1, -1
    max_ie, gscore = -1, -1
    max_off = 0
    beg, end = 0, qlen

    for i in range(tlen):
        f = 0
        mrow = 0
        mj = -1
        q = qp[target[i]]
        if beg < i - w:
            beg = i - w
        if end > i + w + 1:
            end = i + w + 1
        if end > qlen:
            end = qlen
        if beg == 0:
            h1 = h0 - (o_del + e_del * (i + 1))
            if h1 < 0:
                h1 = 0
        else:
            h1 = 0
        for j in range(beg, end):
            # eh[j] holds { H(i-1,j-1), E(i,j) }; f = F(i,j); h1 = H(i,j-1).
            M = int(eh_h[j])
            e = int(eh_e[j])
            eh_h[j] = h1
            M = M + int(q[j]) if M else 0
            h = M if M > e else e
            h = h if h > f else f
            h1 = h
            if mrow <= h:
                mj = j
                mrow = h
            t = M - oe_del
            t = t if t > 0 else 0
            e -= e_del
            e = e if e > t else t
            eh_e[j] = e
            t = M - oe_ins
            t = t if t > 0 else 0
            f -= e_ins
            f = f if f > t else t
        eh_h[end] = h1
        eh_e[end] = 0
        if end == qlen:
            if gscore <= h1:
                max_ie = i
                gscore = h1
        if mrow == 0:
            break
        if mrow > max_score:
            max_score, max_i, max_j = mrow, i, mj
            off = abs(mj - i)
            if off > max_off:
                max_off = off
        elif zdrop > 0:
            if i - max_i > mj - max_j:
                if max_score - mrow - ((i - max_i) - (mj - max_j)) * e_del > zdrop:
                    break
            else:
                if max_score - mrow - ((mj - max_j) - (i - max_i)) * e_ins > zdrop:
                    break
        # Band shrink: skip leading/trailing cells with h == 0 and e == 0.
        j = beg
        while j < end and eh_h[j] == 0 and eh_e[j] == 0:
            j += 1
        beg = j
        j = end
        while j >= beg and eh_h[j] == 0 and eh_e[j] == 0:
            j -= 1
        end = j + 2 if j + 2 < qlen else qlen

    return BswResult(score=int(max_score), qle=max_j + 1, tle=max_i + 1,
                     gtle=max_ie + 1, gscore=int(gscore), max_off=int(max_off))
