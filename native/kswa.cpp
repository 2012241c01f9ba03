// Native local Smith-Waterman with end/start coordinates and a
// second-best score — ksw_align2 semantics (reference:
// src/ksw.cpp:347-381, core scan src/ksw.cpp:111-231), used by PE
// mate rescue. Ported from the tested Python oracle
// (bwa_mem_scale_tpu/ref/ksw_align.py) including its documented
// score2 divergence; start coordinates via the reversed-prefix rescan
// (ksw_align2's revseq trick).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libkswa.so kswa.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "kswa_core.h"

using kswa_core::forward_scan;
using kswa_core::argmax_first;
using kswa_core::ksw_align_one;


extern "C" {

// Batch ksw_align: out[j*6 .. j*6+5] = score, te, qe, score2, tb, qb.
void kswa_batch(int64_t n, const uint8_t* qbuf, const int64_t* qoff,
                const int32_t* qlen, const uint8_t* tbuf,
                const int64_t* toff, const int32_t* tlen,
                const int8_t* mat, int32_t o_del, int32_t e_del,
                int32_t o_ins, int32_t e_ins, int32_t minsc,
                int32_t* out) {
    std::vector<int64_t> H_best, colmax, Hrow, Erow;
    std::vector<uint8_t> rq, rt;
    for (int64_t j = 0; j < n; ++j) {
        const uint8_t* q = qbuf + qoff[j];
        const uint8_t* t = tbuf + toff[j];
        const int lq = qlen[j], lt = tlen[j];
        int32_t* o = out + j * 6;
        o[0] = 0; o[1] = -1; o[2] = -1; o[3] = 0; o[4] = -1; o[5] = -1;
        if (lq == 0 || lt == 0) continue;
        int64_t gmax; int te;
        forward_scan(lq, q, lt, t, mat, o_del, e_del, o_ins, e_ins,
                     (int64_t)1 << 62, &gmax, &te, H_best, colmax,
                     Hrow, Erow);
        o[0] = (int32_t)gmax;
        o[1] = te;
        if (gmax == 0) continue;
        const int qe = argmax_first(H_best);
        o[2] = qe;
        int8_t max_mat = 0;
        for (int i = 0; i < 25; ++i) max_mat = std::max(max_mat, mat[i]);
        const int d = (int)((gmax + max_mat - 1) / max_mat);
        int64_t sc2 = 0; int te2 = -1;
        const int64_t thr = std::max((int64_t)minsc, (int64_t)1);
        for (int i = 0; i < lt; ++i) {
            if (i >= te - d && i <= te + d) continue;
            if (colmax[i] >= thr && colmax[i] > sc2) {
                sc2 = colmax[i];
                te2 = i;
            }
        }
        if (sc2 > 0) o[3] = (int32_t)sc2;
        if (minsc && gmax < minsc) continue;   // no start coords
        rq.assign(q, q + qe + 1);
        std::reverse(rq.begin(), rq.end());
        rt.assign(t, t + te + 1);
        std::reverse(rt.begin(), rt.end());
        int64_t g2; int te_r;
        forward_scan(qe + 1, rq.data(), te + 1, rt.data(), mat, o_del,
                     e_del, o_ins, e_ins, gmax, &g2, &te_r, H_best,
                     colmax, Hrow, Erow);
        if (g2 == gmax) {
            o[4] = te - te_r;
            o[5] = qe - argmax_first(H_best);
        }
    }
}

}  // extern "C"
