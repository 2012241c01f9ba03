#pragma once
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace kswg_core {

constexpr int32_t MINUS_INF = -0x40000000;

// Banded global DP (ksw_global semantics). mat is row-major 5x5,
// score(m,q,t) = mat[t*5 + q]. Returns the score; when `cig` is
// non-null, fills it with (len<<4 | op) runs, op 0=M 1=I 2=D.
inline int32_t ksw_global(int qlen, const uint8_t* q, int tlen,
                   const uint8_t* t, const int8_t* mat, int o_del,
                   int e_del, int o_ins, int e_ins, int w,
                   std::vector<uint32_t>* cig,
                   std::vector<uint8_t>& zbuf,
                   std::vector<int32_t>& Hbuf,
                   std::vector<int32_t>& Ebuf) {
    const int n_col = std::min(qlen, 2 * w + 1);
    const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    Hbuf.assign(qlen + 2, MINUS_INF);
    Ebuf.assign(qlen + 2, MINUS_INF);
    int32_t* H = Hbuf.data();
    int32_t* E = Ebuf.data();
    H[0] = 0;
    for (int j = 1; j <= std::min(qlen, w); ++j)
        H[j] = -(o_ins + e_ins * j);
    uint8_t* z = nullptr;
    if (cig) {
        zbuf.resize((size_t)tlen * n_col);
        z = zbuf.data();
    }
    for (int i = 0; i < tlen; ++i) {
        int32_t f = MINUS_INF;
        const int8_t* qp = mat + 5 * t[i];
        const int beg = i > w ? i - w : 0;
        const int end = i + w + 1 < qlen ? i + w + 1 : qlen;
        int32_t h1 = (beg == 0) ? -(o_del + e_del * (i + 1)) : MINUS_INF;
        uint8_t* zr = z ? z + (size_t)i * n_col : nullptr;
        for (int j = beg; j < end; ++j) {
            int32_t m = H[j];
            int32_t e = E[j];
            H[j] = h1;
            m += qp[q[j]];
            uint8_t d = m >= e ? 0 : 1;
            int32_t h = m >= e ? m : e;
            if (h < f) { d = 2; h = f; }
            h1 = h;
            int32_t tt = m - oe_del;
            e -= e_del;
            if (e > tt) d |= 1 << 2; else e = tt;
            E[j] = e;
            tt = m - oe_ins;
            f -= e_ins;
            if (f > tt) d |= 2 << 4; else f = tt;
            if (zr) zr[j - beg] = d;
        }
        H[end] = h1;
        E[end] = MINUS_INF;
    }
    const int32_t score = H[qlen];
    if (cig) {
        std::vector<uint32_t>& tmp = *cig;  // built reversed, flip after
        tmp.clear();
        auto push = [&](int op, int len) {
            if (!tmp.empty() && (int)(tmp.back() & 0xf) == op)
                tmp.back() += (uint32_t)len << 4;
            else
                tmp.push_back(((uint32_t)len << 4) | op);
        };
        int i = tlen - 1;
        int k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
        int which = 0;
        while (i >= 0 && k >= 0) {
            const int beg = i > w ? i - w : 0;
            which = (z[(size_t)i * n_col + (k - beg)] >> (which << 1)) & 3;
            if (which == 0)      { push(0, 1); --i; --k; }
            else if (which == 1) { push(2, 1); --i; }
            else                 { push(1, 1); --k; }
        }
        if (i >= 0) push(2, i + 1);
        if (k >= 0) push(1, k + 1);
        std::reverse(tmp.begin(), tmp.end());
    }
    return score;
}

// NM + MD over a finished alignment (src/bwa.cpp:430-458 semantics,
// ported from ref/ksw.py compute_nm_md).
inline void nm_md(const uint32_t* cig, int ncig, const uint8_t* q,
           const uint8_t* t, int is_fw, int32_t* nm_out, char* md,
           int32_t md_cap, int32_t* md_len) {
    static const char fwb[] = "ACGTN";
    static const char rcb[] = "TGCAN";
    const char* base = is_fw ? fwb : rcb;
    int x = 0, y = 0, u = 0, n_mm = 0, n_gap = 0, p = 0;
    auto putnum = [&](int v) {
        char b[12];
        int l = snprintf(b, sizeof b, "%d", v);
        for (int i = 0; i < l && p < md_cap; ++i) md[p++] = b[i];
    };
    for (int kk = 0; kk < ncig; ++kk) {
        const int len = cig[kk] >> 4, op = cig[kk] & 0xf;
        if (op == 0) {
            for (int i = 0; i < len; ++i) {
                if (q[x + i] != t[y + i]) {
                    putnum(u);
                    if (p < md_cap) md[p++] = base[t[y + i]];
                    ++n_mm;
                    u = 0;
                } else ++u;
            }
            x += len; y += len;
        } else if (op == 2) {
            if (kk > 0 && kk < ncig - 1) {
                putnum(u);
                if (p < md_cap) md[p++] = '^';
                for (int i = 0; i < len && p < md_cap; ++i)
                    md[p++] = base[t[y + i]];
                u = 0;
                n_gap += len;
            }
            y += len;
        } else if (op == 1) {
            x += len;
            n_gap += len;
        }
    }
    putnum(u);
    *nm_out = n_mm + n_gap;
    *md_len = p;
}

}  // namespace kswg_core