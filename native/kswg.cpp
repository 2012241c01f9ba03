// Native CIGAR finalization: banded global alignment + traceback +
// band-retry loop + NM/MD, batched over the output records of a read
// batch.
//
// Host-side counterpart of the reference's CIGAR path: ksw_global2
// (reference: src/ksw.cpp:558-672) driven by bwa_gen_cigar2
// (src/bwa.cpp:380-470) under mem_reg2aln's band-doubling retry
// (src/bwamem.cpp:2533-2624). Semantics are ported from the tested
// Python oracle (bwa_mem_scale_tpu/ref/ksw.py) bit-for-bit; the TPU
// build keeps CIGARs on the host because each job is a tiny
// (<=len x band) DP — microseconds in native code — while a device
// round trip costs milliseconds of queue serialization.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libkswg.so kswg.cpp

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t MINUS_INF = -0x40000000;

// Banded global DP (ksw_global semantics). mat is row-major 5x5,
// score(m,q,t) = mat[t*5 + q]. Returns the score; when `cig` is
// non-null, fills it with (len<<4 | op) runs, op 0=M 1=I 2=D.
int32_t ksw_global(int qlen, const uint8_t* q, int tlen,
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
void nm_md(const uint32_t* cig, int ncig, const uint8_t* q,
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

}  // namespace

extern "C" {

// Finalize a batch of output records: per job run the bwa_gen_cigar2
// band selection + mem_reg2aln retry loop (or the gap-free shortcut),
// then NM/MD. Sequences are nt4 codes (0-4), rc-strand jobs already
// reversed by the caller. Returns 0, or the 1-based index of the
// first job whose cigar overflowed cig_stride (nothing written for it).
int64_t kswg_finalize_batch(
    int64_t n,
    const uint8_t* qbuf, const int64_t* qoff, const int32_t* qlen,
    const uint8_t* tbuf, const int64_t* toff, const int32_t* tlen,
    const int32_t* w2_in, const int32_t* truesc, const uint8_t* is_fw,
    const int8_t* mat, int32_t o_del, int32_t e_del, int32_t o_ins,
    int32_t e_ins, int32_t a, int32_t maxw,
    int32_t* score_out, uint32_t* cig_out, int32_t* ncig_out,
    int32_t cig_stride, int32_t* nm_out, char* md_out,
    int32_t* mdlen_out, int32_t md_stride) {
    std::vector<uint32_t> cig;
    std::vector<uint8_t> zbuf;
    std::vector<int32_t> Hbuf, Ebuf;
    for (int64_t j = 0; j < n; ++j) {
        const uint8_t* q = qbuf + qoff[j];
        const uint8_t* t = tbuf + toff[j];
        const int lq = qlen[j], lt = tlen[j];
        int w2 = std::min(w2_in[j], maxw);
        int32_t last_sc = -(1 << 30);
        int rounds = 0;
        int32_t score = 0;
        while (true) {
            if (lq == lt && w2 == 0) {
                // gap-free shortcut (src/bwa.cpp:404-414)
                cig.clear();
                cig.push_back(((uint32_t)lq << 4) | 0);
                score = 0;
                for (int i = 0; i < lq; ++i)
                    score += mat[t[i] * 5 + q[i]];
            } else {
                // band selection (bwa_gen_cigar2)
                const int m00 = mat[0];
                const int max_ins = (int)((((lq + 1) >> 1) * (double)m00
                                           - o_ins) / e_ins + 1.0);
                const int max_del = (int)((((lq + 1) >> 1) * (double)m00
                                           - o_del) / e_del + 1.0);
                const int max_gap = std::max(std::max(max_ins, max_del), 1);
                int w = (max_gap + std::abs(lt - lq) + 1) >> 1;
                w = std::min(w, w2);
                w = std::max(w, std::abs(lt - lq) + 3);
                score = ksw_global(lq, q, lt, t, mat, o_del, e_del,
                                   o_ins, e_ins, w, &cig, zbuf, Hbuf,
                                   Ebuf);
            }
            if (score == last_sc || w2 == maxw) break;
            last_sc = score;
            w2 <<= 1;
            ++rounds;
            if (!(rounds < 4 && score < truesc[j] - a)) break;
            w2 = std::min(w2, maxw);
        }
        if ((int32_t)cig.size() > cig_stride) return j + 1;
        score_out[j] = score;
        ncig_out[j] = (int32_t)cig.size();
        std::memcpy(cig_out + (size_t)j * cig_stride, cig.data(),
                    cig.size() * sizeof(uint32_t));
        nm_md(cig.data(), (int)cig.size(), q, t, is_fw[j], nm_out + j,
              md_out + (size_t)j * md_stride, md_stride, mdlen_out + j);
    }
    return 0;
}

}  // extern "C"
