// ksw_align2 core scan (shared by the kswa batch entry and the
// native PE rescue in finalize.cpp). Semantics: ref/ksw_align.py.
#ifndef KSWA_CORE_H
#define KSWA_CORE_H

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace kswa_core {


constexpr int64_t NEG = -((int64_t)1 << 60);

// Forward local scan. Fills H_best (row at the best target column)
// and colmax (per-target-column maxima). Returns (gmax, te).
// Matches ref/ksw_align._forward_scan: H_best/argmax ties keep the
// FIRST index; early stop when the running best reaches stop_at.
void forward_scan(int qlen, const uint8_t* q, int tlen,
                  const uint8_t* t, const int8_t* mat, int o_del,
                  int e_del, int o_ins, int e_ins, int64_t stop_at,
                  int64_t* gmax_out, int* te_out,
                  std::vector<int64_t>& H_best,
                  std::vector<int64_t>& colmax,
                  std::vector<int64_t>& Hrow,
                  std::vector<int64_t>& Erow) {
    Hrow.assign(qlen, 0);       // H_prev
    Erow.assign(qlen, 0);
    H_best.assign(qlen, 0);
    colmax.assign(tlen, 0);
    int64_t gmax = 0;
    int te = -1;
    const int oe_ins = o_ins + e_ins, oe_del = o_del + e_del;
    std::vector<int64_t> Hp(qlen), Hn(qlen);
    for (int i = 0; i < tlen; ++i) {
        const int8_t* sc = mat + 5 * t[i];
        // Hp_j = max(diag + S, E_j, 0)
        int64_t diag_prev = 0;  // H_prev[j-1], starts at 0 for j=0
        for (int j = 0; j < qlen; ++j) {
            int64_t m = diag_prev + sc[q[j]];
            diag_prev = Hrow[j];
            int64_t hp = std::max({m, Erow[j], (int64_t)0});
            Hp[j] = hp;
        }
        // F left-to-right from Hp (no F-origin chaining), then final H
        int64_t f = NEG;
        int64_t cm = 0;
        for (int j = 0; j < qlen; ++j) {
            int64_t h = std::max({Hp[j], f, (int64_t)0});
            Hn[j] = h;
            cm = std::max(cm, h);
            // E for the next row (uses the final H)
            Erow[j] = std::max({h - oe_del, Erow[j] - e_del,
                                (int64_t)0});
            // F for the next column opens from Hp[j]
            f = std::max(f - e_ins, Hp[j] - oe_ins);
        }
        colmax[i] = cm;
        std::swap(Hrow, Hn);
        if (cm > gmax) {
            gmax = cm;
            te = i;
            std::copy(Hrow.begin(), Hrow.end(), H_best.begin());
            if (gmax >= stop_at) break;
        }
    }
    *gmax_out = gmax;
    *te_out = te;
}

int argmax_first(const std::vector<int64_t>& v) {
    int best = 0;
    for (size_t i = 1; i < v.size(); ++i)
        if (v[i] > v[best]) best = (int)i;
    return best;
}


// full ksw_align2: returns (score, te, qe, score2, tb, qb) in out[6]
inline void ksw_align_one(const uint8_t* q, int lq, const uint8_t* t,
                          int lt, const int8_t* mat, int o_del,
                          int e_del, int o_ins, int e_ins,
                          int32_t minsc, int32_t* o,
                          std::vector<int64_t>& H_best,
                          std::vector<int64_t>& colmax,
                          std::vector<int64_t>& Hrow,
                          std::vector<int64_t>& Erow,
                          std::vector<uint8_t>& rq,
                          std::vector<uint8_t>& rt) {
    o[0] = 0; o[1] = -1; o[2] = -1; o[3] = 0; o[4] = -1; o[5] = -1;
    if (lq == 0 || lt == 0) return;
    int64_t gmax; int te;
    forward_scan(lq, q, lt, t, mat, o_del, e_del, o_ins, e_ins,
                 (int64_t)1 << 62, &gmax, &te, H_best, colmax, Hrow,
                 Erow);
    o[0] = (int32_t)gmax;
    o[1] = te;
    if (gmax == 0) return;
    const int qe = argmax_first(H_best);
    o[2] = qe;
    int8_t max_mat = 0;
    for (int i = 0; i < 25; ++i) max_mat = std::max(max_mat, mat[i]);
    const int d = (int)((gmax + max_mat - 1) / max_mat);
    int64_t sc2 = 0;
    const int64_t thr = std::max((int64_t)minsc, (int64_t)1);
    for (int i = 0; i < lt; ++i) {
        if (i >= te - d && i <= te + d) continue;
        if (colmax[i] >= thr && colmax[i] > sc2) sc2 = colmax[i];
    }
    if (sc2 > 0) o[3] = (int32_t)sc2;
    if (minsc && gmax < minsc) return;
    rq.assign(q, q + qe + 1);
    std::reverse(rq.begin(), rq.end());
    rt.assign(t, t + te + 1);
    std::reverse(rt.begin(), rt.end());
    int64_t g2; int te_r;
    forward_scan(qe + 1, rq.data(), te + 1, rt.data(), mat, o_del,
                 e_del, o_ins, e_ins, gmax, &g2, &te_r, H_best, colmax,
                 Hrow, Erow);
    if (g2 == gmax) {
        o[4] = te - te_r;
        o[5] = qe - argmax_first(H_best);
    }
}

}  // namespace kswa_core
#endif  // KSWA_CORE_H
