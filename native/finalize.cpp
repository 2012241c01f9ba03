// Native SE finalization: device region rows -> finished SAM records.
//
// Host-side counterpart of the reference's per-read output pipeline:
// mem_sort_dedup_patch (src/bwamem.cpp:314-375) + mem_patch_reg
// (:200-250), mem_mark_primary_se (:1933-1977), mem_gen_alt
// (src/bwamem_extra.cpp:130-183), the mem_reg2sam selection loop
// (:2092-2130) and mem_reg2aln (:2533-2624) with bwa_gen_cigar2 /
// ksw_global2 (src/bwa.cpp:380-470). Semantics are ported bit-for-bit
// from the tested Python oracle (bwa_mem_scale_tpu/ref/finalize.py,
// pipeline/finalize.py) — the Python path stays as the differential
// oracle and fallback. The TPU build keeps this stage on the host
// because it is object-/string-shaped work the reference also runs
// native; at bench scale the Python loop was ~60% of end-to-end wall
// on this one-core box.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfinalize.so finalize.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "kswg_core.h"

namespace {

using kswg_core::ksw_global;
using kswg_core::nm_md;

constexpr double PATCH_MAX_R_BW = 0.05;
constexpr double PATCH_MIN_SC_RATIO = 0.90;
constexpr double MEM_MAPQ_COEF = 30.0;
constexpr int32_t MEM_F_ALL = 0x8;
constexpr int32_t MEM_F_NO_MULTI = 0x10;
constexpr int32_t MEM_F_PRIMARY5 = 0x800;
constexpr int32_t MEM_F_KEEP_SUPP_MAPQ = 0x1000;
constexpr int32_t SEC_ALT = 0x7FFFFFFF;  // (1 << 31) - 1

struct Opt {
    int32_t a, b, o_del, e_del, o_ins, e_ins, w, T;
    int32_t min_seed_len, max_chain_gap;
    double mask_level, drop_ratio, XA_drop_ratio, mask_level_redun;
    int32_t max_XA_hits, max_XA_hits_alt;
    int32_t mapQ_coef_len;
    double mapQ_coef_fac;
    int32_t flag;
    int8_t mat[25];
};

struct Bns {
    const int64_t* ann_off;   // [n_seqs]
    const int64_t* ann_len;   // [n_seqs]
    const uint8_t* is_alt;    // [n_seqs]
    const char* names;        // concatenated, NUL separated
    const int64_t* name_off;  // [n_seqs]
    int64_t n_seqs;
    int64_t l_pac;
};

struct Reg {
    int64_t rb, re;
    int32_t qb, qe, rid, score, truesc, w, seedcov, seedlen0;
    int32_t sub = 0, alt_sc = 0, csub = 0, sub_n = 0;
    int32_t secondary = -1, secondary_all = -1, n_comp = 1;
    bool is_alt = false;
    double frac_rep = 0.0;
    uint64_t hash = 0;
};

uint64_t hash_64(uint64_t key) {
    // Thomas Wang mix (reference src/utils.h:117-128)
    key = key + ~(key << 32);
    key ^= key >> 22;
    key = key + ~(key << 13);
    key ^= key >> 8;
    key = key + (key << 3);
    key ^= key >> 15;
    key = key + ~(key << 27);
    key ^= key >> 31;
    return key;
}

// ---- gen_cigar score-only (patch_reg's probe; ref/ksw.py gen_cigar) ----
int32_t gen_cigar_score_w(const Opt& opt, int w2, int64_t l_pac,
                          const uint8_t* ref_string, const uint8_t* query,
                          int l_query, int64_t rb, int64_t re,
                          std::vector<uint8_t>& qtmp,
                          std::vector<uint8_t>& ttmp,
                          std::vector<uint8_t>& zbuf,
                          std::vector<int32_t>& Hbuf,
                          std::vector<int32_t>& Ebuf) {
    if (l_query <= 0 || rb >= re || (rb < l_pac && re > l_pac)) return 0;
    const int rlen = (int)(re - rb);
    qtmp.assign(query, query + l_query);
    ttmp.assign(ref_string + rb, ref_string + re);
    if (rb >= l_pac) {
        std::reverse(qtmp.begin(), qtmp.end());
        std::reverse(ttmp.begin(), ttmp.end());
    }
    if (l_query == rlen && w2 == 0) {
        int32_t sc = 0;
        for (int i = 0; i < l_query; ++i)
            sc += opt.mat[ttmp[i] * 5 + qtmp[i]];
        return sc;
    }
    const int m00 = opt.mat[0];
    const int max_ins = (int)((((l_query + 1) >> 1) * (double)m00
                               - opt.o_ins) / opt.e_ins + 1.0);
    const int max_del = (int)((((l_query + 1) >> 1) * (double)m00
                               - opt.o_del) / opt.e_del + 1.0);
    const int max_gap = std::max(std::max(max_ins, max_del), 1);
    int w = (max_gap + std::abs(rlen - l_query) + 1) >> 1;
    w = std::min(w, w2);
    w = std::max(w, std::abs(rlen - l_query) + 3);
    return ksw_global(l_query, qtmp.data(), rlen, ttmp.data(), opt.mat,
                      opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, w,
                      nullptr, zbuf, Hbuf, Ebuf);
}

// ---- patch_reg (ref/finalize.py:44-70, mem_patch_reg) ----
struct PatchRes { int32_t score, w; };
PatchRes patch_reg(const Opt& opt, const Bns& bns,
                   const uint8_t* ref_string, const uint8_t* query,
                   const Reg& a, const Reg& b,
                   std::vector<uint8_t>& qtmp, std::vector<uint8_t>& ttmp,
                   std::vector<uint8_t>& zbuf, std::vector<int32_t>& Hbuf,
                   std::vector<int32_t>& Ebuf) {
    if (a.rb < bns.l_pac && b.rb >= bns.l_pac) return {0, 0};
    if (a.qb >= b.qb || a.qe >= b.qe || a.re >= b.re) return {0, 0};
    int64_t w64 = std::llabs((a.re - b.rb) - (int64_t)(a.qe - b.qb));
    double r = std::fabs((double)(a.re - b.rb) / (double)(b.re - a.rb)
                         - (double)(a.qe - b.qb) / (double)(b.qe - a.qb));
    if (a.re < b.rb || a.qe < b.qb) {
        if (w64 > (opt.w << 1) || r >= PATCH_MAX_R_BW) return {0, 0};
    } else if (w64 > (opt.w << 2) || r >= PATCH_MAX_R_BW * 2) {
        return {0, 0};
    }
    int w = (int)w64 + a.w + b.w;
    w = std::min(w, opt.w << 2);
    int32_t score = gen_cigar_score_w(opt, w, bns.l_pac, ref_string,
                                      query + a.qb, b.qe - a.qb, a.rb,
                                      b.re, qtmp, ttmp, zbuf, Hbuf, Ebuf);
    int32_t q_s = (int32_t)((double)(b.qe - a.qb)
                            / ((b.qe - b.qb) + (a.qe - a.qb))
                            * (b.score + a.score) + 0.499);
    int32_t r_s = (int32_t)((double)(b.re - a.rb)
                            / ((b.re - b.rb) + (a.re - a.rb))
                            * (b.score + a.score) + 0.499);
    if ((double)score / std::max(q_s, r_s) < PATCH_MIN_SC_RATIO)
        return {0, 0};
    return {score, w};
}

// ---- sort_dedup_patch (ref/finalize.py:73-123, mem_sort_dedup_patch) --
void sort_dedup_patch(const Opt& opt, const Bns& bns,
                      const uint8_t* ref_string, const uint8_t* query,
                      std::vector<Reg>& regs, std::vector<uint8_t>& qtmp,
                      std::vector<uint8_t>& ttmp, std::vector<uint8_t>& zbuf,
                      std::vector<int32_t>& Hbuf, std::vector<int32_t>& Ebuf) {
    const size_t n = regs.size();
    if (n <= 1) return;
    std::stable_sort(regs.begin(), regs.end(),
                     [](const Reg& x, const Reg& y) { return x.re < y.re; });
    for (auto& r : regs) r.n_comp = 1;
    for (size_t i = 1; i < n; ++i) {
        Reg& p = regs[i];
        if (p.rid != regs[i - 1].rid
            || p.rb >= regs[i - 1].re + opt.max_chain_gap)
            continue;
        for (int64_t j = (int64_t)i - 1;
             j >= 0 && p.rid == regs[j].rid
             && p.rb < regs[j].re + opt.max_chain_gap; --j) {
            Reg& q = regs[j];
            if (q.qe == q.qb) continue;
            int64_t or_ = q.re - p.rb;
            int64_t oq = (q.qb < p.qb) ? (int64_t)(q.qe - p.qb)
                                       : (int64_t)(p.qe - q.qb);
            int64_t mr = std::min(q.re - q.rb, p.re - p.rb);
            int32_t mq = std::min(q.qe - q.qb, p.qe - p.qb);
            if (or_ > opt.mask_level_redun * mr
                && oq > opt.mask_level_redun * mq) {
                if (p.score < q.score) { p.qe = p.qb; break; }
                q.qe = q.qb;
            } else if (q.rb < p.rb) {
                PatchRes pr = patch_reg(opt, bns, ref_string, query, q, p,
                                        qtmp, ttmp, zbuf, Hbuf, Ebuf);
                if (pr.score > 0) {
                    p.n_comp += q.n_comp + 1;
                    p.seedcov = std::max(p.seedcov, q.seedcov);
                    p.sub = std::max(p.sub, q.sub);
                    p.csub = std::max(p.csub, q.csub);
                    p.qb = q.qb;
                    p.rb = q.rb;
                    p.truesc = p.score = pr.score;
                    p.w = pr.w;
                    q.qb = q.qe;  // kill q (qe == qb)
                }
            }
        }
    }
    regs.erase(std::remove_if(regs.begin(), regs.end(),
                              [](const Reg& r) { return r.qe <= r.qb; }),
               regs.end());
    std::stable_sort(regs.begin(), regs.end(),
                     [](const Reg& x, const Reg& y) {
                         if (x.score != y.score) return x.score > y.score;
                         if (x.rb != y.rb) return x.rb < y.rb;
                         return x.qb < y.qb;
                     });
    for (size_t i = 1; i < regs.size(); ++i)
        if (regs[i].score == regs[i - 1].score
            && regs[i].rb == regs[i - 1].rb
            && regs[i].qb == regs[i - 1].qb)
            regs[i].qe = regs[i].qb;
    regs.erase(std::remove_if(regs.begin(), regs.end(),
                              [](const Reg& r) { return r.qe <= r.qb; }),
               regs.end());
}

// NOTE the Python oracle kills q by `q.qe = q.qb` in the redundancy
// branch and by `q.qb = q.qe` in the patch branch — both leave
// qe == qb, filtered identically above.

// ---- mark_primary (ref/finalize.py:126-194, mem_mark_primary_se) ----
void mark_primary_core(const Opt& opt, std::vector<Reg*>& a) {
    const int32_t tmp = std::max(opt.a + opt.b,
                                 std::max(opt.o_del + opt.e_del,
                                          opt.o_ins + opt.e_ins));
    std::vector<int> z = {0};
    for (int i = 1; i < (int)a.size(); ++i) {
        int found = -1;
        for (int k : z) {
            int32_t b_max = std::max(a[k]->qb, a[i]->qb);
            int32_t e_min = std::min(a[k]->qe, a[i]->qe);
            if (e_min > b_max) {
                int32_t min_l = std::min(a[i]->qe - a[i]->qb,
                                         a[k]->qe - a[k]->qb);
                if (e_min - b_max >= min_l * opt.mask_level) {
                    if (a[k]->sub == 0) a[k]->sub = a[i]->score;
                    if (a[k]->score - a[i]->score <= tmp
                        && (a[k]->is_alt || !a[i]->is_alt))
                        ++a[k]->sub_n;
                    found = k;
                    break;
                }
            }
        }
        if (found < 0) z.push_back(i);
        else a[i]->secondary = found;
    }
}

int mark_primary(const Opt& opt, std::vector<Reg>& regs, int64_t read_id) {
    const int n = (int)regs.size();
    if (n == 0) return 0;
    int n_pri = 0;
    for (int i = 0; i < n; ++i) {
        Reg& r = regs[i];
        r.sub = r.alt_sc = 0;
        r.secondary = r.secondary_all = -1;
        r.hash = hash_64((uint64_t)(read_id + i));
        if (!r.is_alt) ++n_pri;
    }
    std::stable_sort(regs.begin(), regs.end(),
                     [](const Reg& x, const Reg& y) {
                         if (x.score != y.score) return x.score > y.score;
                         if (x.is_alt != y.is_alt) return !x.is_alt;
                         return x.hash < y.hash;
                     });
    {
        std::vector<Reg*> view(n);
        for (int i = 0; i < n; ++i) view[i] = &regs[i];
        mark_primary_core(opt, view);
    }
    for (int i = 0; i < n; ++i) {
        Reg& p = regs[i];
        p.secondary_all = i;
        if (!p.is_alt && p.secondary >= 0 && regs[p.secondary].is_alt)
            p.alt_sc = regs[p.secondary].score;
    }
    if (n_pri < n) {
        if (n_pri > 0)
            std::stable_sort(regs.begin(), regs.end(),
                             [](const Reg& x, const Reg& y) {
                                 if (x.is_alt != y.is_alt) return !x.is_alt;
                                 if (x.score != y.score)
                                     return x.score > y.score;
                                 return x.hash < y.hash;
                             });
        std::vector<int> z(n);
        for (int i = 0; i < n; ++i) z[regs[i].secondary_all] = i;
        for (int i = 0; i < n; ++i) {
            Reg& r = regs[i];
            if (r.secondary >= 0) {
                r.secondary_all = z[r.secondary];
                if (r.is_alt) r.secondary = SEC_ALT;
            } else {
                r.secondary_all = -1;
            }
        }
        if (n_pri > 0) {
            for (int i = 0; i < n_pri; ++i) {
                regs[i].sub = 0;
                regs[i].secondary = -1;
            }
            std::vector<Reg*> view(n_pri);
            for (int i = 0; i < n_pri; ++i) view[i] = &regs[i];
            mark_primary_core(opt, view);
        }
    } else {
        for (auto& r : regs) r.secondary_all = r.secondary;
    }
    return n_pri;
}

// ---- reorder_primary5 (ref/finalize.py:196-221) ----
void reorder_primary5(int32_t T, std::vector<Reg>& regs) {
    int n_pri = 0;
    for (auto& r : regs)
        if (r.secondary < 0 && !r.is_alt && r.score >= T) ++n_pri;
    if (n_pri <= 1) return;
    int32_t left_st = 1 << 30;
    int left_k = -1;
    for (int k = 0; k < (int)regs.size(); ++k) {
        const Reg& r = regs[k];
        if (r.secondary >= 0 || r.is_alt || r.score < T) continue;
        if (r.qb < left_st) { left_st = r.qb; left_k = k; }
    }
    if (left_k <= 0) return;
    std::swap(regs[0], regs[left_k]);
    for (int k = 1; k < (int)regs.size(); ++k) {
        Reg& r = regs[k];
        if (r.secondary == 0) r.secondary = left_k;
        else if (r.secondary == left_k) r.secondary = 0;
        if (r.secondary_all == 0) r.secondary_all = left_k;
        else if (r.secondary_all == left_k) r.secondary_all = 0;
    }
}

// ---- approx_mapq (ref/finalize.py:224-246, mem_approx_mapq_se) ----
int approx_mapq(const Opt& opt, const Reg& a) {
    int32_t sub = a.sub ? a.sub : opt.min_seed_len * opt.a;
    sub = std::max(a.csub, sub);
    if (sub >= a.score) return 0;
    int64_t l = std::max((int64_t)(a.qe - a.qb), a.re - a.rb);
    double identity = 1.0 - (double)(l * opt.a - a.score)
                            / (opt.a + opt.b) / (double)l;
    int mapq;
    if (a.score == 0) {
        mapq = 0;
    } else if (opt.mapQ_coef_len > 0) {
        double tmp = (l < opt.mapQ_coef_len)
                         ? 1.0
                         : opt.mapQ_coef_fac / std::log((double)l);
        tmp *= identity * identity;
        mapq = (int)(6.02 * (a.score - sub) / opt.a * tmp * tmp + 0.499);
    } else {
        mapq = (int)(MEM_MAPQ_COEF * (1.0 - (double)sub / a.score)
                     * std::log((double)a.seedcov) + 0.499);
        if (identity < 0.95)
            mapq = (int)(mapq * identity * identity + 0.499);
    }
    if (a.sub_n > 0)
        mapq -= (int)(4.343 * std::log((double)a.sub_n + 1) + 0.499);
    mapq = std::min(mapq, 60);
    mapq = std::max(mapq, 0);
    return (int)(mapq * (1.0 - a.frac_rep) + 0.499);
}

int32_t infer_bw(int32_t l1, int32_t l2, int32_t score, int32_t a,
                 int32_t q, int32_t r) {
    if (l1 == l2 && l1 * a - score < ((q + r - a) << 1)) return 0;
    int32_t w = (int32_t)((double)(std::min(l1, l2) * a - score - q)
                          / r + 2.0);
    return std::max(w, std::abs(l1 - l2));
}

int64_t pos2rid(const Bns& bns, int64_t pos_f) {
    int64_t lo = 0, hi = bns.n_seqs - 1;
    while (lo < hi) {  // last offset <= pos_f
        int64_t mid = (lo + hi + 1) >> 1;
        if (bns.ann_off[mid] <= pos_f) lo = mid;
        else hi = mid - 1;
    }
    return lo;
}

// ---- per-job cigar state ----
struct Job {
    const Reg* reg;
    std::vector<uint8_t> q, t;   // oriented slices
    int64_t rb, re;
    int32_t w2, truesc;
    bool is_fw;
    // results
    std::vector<uint32_t> cig;   // (len<<4 | op)
    int32_t score = 0, nm = -1;
    std::string md;
};

bool make_job(const Opt& opt, const Bns& bns, const uint8_t* ref_string,
              const uint8_t* query, int l_query, const Reg& ar, Job* out) {
    int32_t qb = ar.qb, qe = ar.qe;
    int64_t rb = ar.rb, re = ar.re;
    if (qe - qb <= 0 || rb >= re || (rb < bns.l_pac && re > bns.l_pac))
        return false;
    int32_t w2 = std::max(
        infer_bw(qe - qb, (int32_t)(re - rb), ar.truesc, opt.a, opt.o_del,
                 opt.e_del),
        infer_bw(qe - qb, (int32_t)(re - rb), ar.truesc, opt.a, opt.o_ins,
                 opt.e_ins));
    if (w2 > opt.w) w2 = std::min(w2, ar.w);
    out->reg = &ar;
    out->q.assign(query + qb, query + qe);
    out->t.assign(ref_string + rb, ref_string + re);
    if (rb >= bns.l_pac) {
        std::reverse(out->q.begin(), out->q.end());
        std::reverse(out->t.begin(), out->t.end());
    }
    out->rb = rb;
    out->re = re;
    out->w2 = w2;
    out->truesc = ar.truesc;
    out->is_fw = rb < bns.l_pac;
    return true;
}

void resolve_job(const Opt& opt, Job& j, std::vector<uint8_t>& zbuf,
                 std::vector<int32_t>& Hbuf, std::vector<int32_t>& Ebuf) {
    // bwa_gen_cigar2 band selection under mem_reg2aln's w2 retry loop
    const int lq = (int)j.q.size(), lt = (int)j.t.size();
    const int maxw = opt.w << 2;
    int w2 = std::min(j.w2, maxw);
    int32_t last_sc = -(1 << 30);
    int rounds = 0;
    while (true) {
        if (lq == lt && w2 == 0) {
            j.cig.clear();
            j.cig.push_back(((uint32_t)lq << 4) | 0);
            j.score = 0;
            for (int i = 0; i < lq; ++i)
                j.score += opt.mat[j.t[i] * 5 + j.q[i]];
        } else {
            const int m00 = opt.mat[0];
            const int max_ins = (int)((((lq + 1) >> 1) * (double)m00
                                       - opt.o_ins) / opt.e_ins + 1.0);
            const int max_del = (int)((((lq + 1) >> 1) * (double)m00
                                       - opt.o_del) / opt.e_del + 1.0);
            const int max_gap = std::max(std::max(max_ins, max_del), 1);
            int w = (max_gap + std::abs(lt - lq) + 1) >> 1;
            w = std::min(w, w2);
            w = std::max(w, std::abs(lt - lq) + 3);
            j.score = ksw_global(lq, j.q.data(), lt, j.t.data(), opt.mat,
                                 opt.o_del, opt.e_del, opt.o_ins,
                                 opt.e_ins, w, &j.cig, zbuf, Hbuf, Ebuf);
        }
        if (j.score == last_sc || w2 == maxw) break;
        last_sc = j.score;
        w2 <<= 1;
        ++rounds;
        if (!(rounds < 4 && j.score < j.truesc - opt.a)) break;
        w2 = std::min(w2, maxw);
    }
    char mdbuf[4096];
    int32_t mdlen = 0;
    nm_md(j.cig.data(), (int)j.cig.size(), j.q.data(), j.t.data(),
          j.is_fw ? 1 : 0, &j.nm, mdbuf, sizeof mdbuf, &mdlen);
    j.md.assign(mdbuf, mdlen);
}

// job_to_aln (pipeline/finalize.py:198-238)
struct AlnOut {
    int64_t pos = -1;
    int32_t rid = -1, flag = 0, mapq = 0, score = -1, sub = -1;
    int32_t nm = -1, alt_sc = 0;
    bool is_rev = false, is_alt = false;
    std::vector<uint32_t> cig;   // final (incl. soft clips, op 3)
    std::string md;
};

bool job_to_aln(const Opt& opt, const Bns& bns, const Job& j, int l_query,
                AlnOut* a) {
    const Reg& ar = *j.reg;
    a->mapq = (ar.secondary < 0) ? approx_mapq(opt, ar) : 0;
    a->flag = (ar.secondary >= 0) ? 0x100 : 0;
    a->nm = j.nm;
    a->md = j.md;
    int64_t p0 = j.is_fw ? j.rb : j.re - 1;
    a->is_rev = p0 >= bns.l_pac;
    int64_t pos = a->is_rev ? (bns.l_pac << 1) - 1 - p0 : p0;
    const uint32_t* cig = j.cig.data();
    int ncig = (int)j.cig.size();
    if (ncig) {
        if ((cig[0] & 0xf) == 2) {       // leading deletion
            pos += cig[0] >> 4;
            ++cig;
            --ncig;
        } else if ((cig[ncig - 1] & 0xf) == 2) {
            --ncig;
        }
    }
    a->cig.clear();
    const int32_t qb = ar.qb, qe = ar.qe;
    if (qb != 0 || qe != l_query) {
        int32_t clip5 = a->is_rev ? l_query - qe : qb;
        int32_t clip3 = a->is_rev ? qb : l_query - qe;
        if (clip5) a->cig.push_back(((uint32_t)clip5 << 4) | 3);
        a->cig.insert(a->cig.end(), cig, cig + ncig);
        if (clip3) a->cig.push_back(((uint32_t)clip3 << 4) | 3);
    } else {
        a->cig.assign(cig, cig + ncig);
    }
    int64_t rid = pos2rid(bns, pos);
    if (rid != ar.rid) return false;     // oracle asserts; flag instead
    a->rid = (int32_t)rid;
    a->pos = pos - bns.ann_off[rid];
    a->score = ar.score;
    a->sub = std::max(ar.sub, ar.csub);
    a->is_alt = ar.is_alt;
    a->alt_sc = ar.alt_sc;
    return true;
}

}  // namespace

extern "C" {

// Finalize a batch of reads from flat device-region rows.
//
// Region rows (length n_rows, read-major order): rr_read, rr_rb,
// rr_re (int64), rr_qb/qe/rid/score/truesc/w/seedcov/seedlen0 (int32).
// Reads listed in `proc_reads` (length n_proc, ascending) are
// processed; rows of other reads are skipped (Python handles
// overflow retries and EMF hits itself).
//
// Outputs: per processed read rd_nrec; flat per-record arrays in read
// order. cig_out stride = cig_stride uint32 ops; md/xa go into shared
// char arenas with per-record (off, len). Returns the total record
// count, or -1 on capacity overflow (caller falls back to Python),
// -2 on a rid-consistency failure.
int64_t finalize_se_batch(
    // regions
    int64_t n_rows, const int32_t* rr_read, const int64_t* rr_rb,
    const int64_t* rr_re, const int32_t* rr_qb, const int32_t* rr_qe,
    const int32_t* rr_rid, const int32_t* rr_score,
    const int32_t* rr_truesc, const int32_t* rr_w,
    const int32_t* rr_seedcov, const int32_t* rr_seedlen0,
    // per-read
    int64_t n_proc, const int32_t* proc_reads, const float* frac_rep,
    const int64_t* read_ids,
    const int32_t* codes, int64_t codes_stride, const int32_t* lens,
    // reference + annotations
    const uint8_t* ref_string, int64_t l_pac, int64_t n_seqs,
    const int64_t* ann_off, const int64_t* ann_len,
    const uint8_t* ann_is_alt, const char* names,
    const int64_t* name_off,
    // options
    const int8_t* mat, int32_t a, int32_t b, int32_t o_del,
    int32_t e_del, int32_t o_ins, int32_t e_ins, int32_t w, int32_t T,
    int32_t min_seed_len, int32_t max_chain_gap, double mask_level,
    double drop_ratio, double XA_drop_ratio, double mask_level_redun,
    int32_t max_XA_hits, int32_t max_XA_hits_alt, int32_t mapQ_coef_len,
    double mapQ_coef_fac, int32_t flag, int32_t extra_flag,
    // outputs
    int32_t* rd_nrec, int64_t rec_cap, int32_t* rec_read,
    int32_t* rec_rid, int64_t* rec_pos, int32_t* rec_flag,
    int32_t* rec_mapq, int32_t* rec_score, int32_t* rec_sub,
    int32_t* rec_nm, int32_t* rec_alt_sc, uint8_t* rec_is_rev,
    uint8_t* rec_is_alt, int32_t* rec_ncig, uint32_t* cig_out,
    int32_t cig_stride, char* md_arena, int64_t md_cap,
    int64_t* rec_md_off, int32_t* rec_md_len, char* xa_arena,
    int64_t xa_cap, int64_t* rec_xa_off, int32_t* rec_xa_len) {
    Opt opt;
    opt.a = a; opt.b = b; opt.o_del = o_del; opt.e_del = e_del;
    opt.o_ins = o_ins; opt.e_ins = e_ins; opt.w = w; opt.T = T;
    opt.min_seed_len = min_seed_len; opt.max_chain_gap = max_chain_gap;
    opt.mask_level = mask_level; opt.drop_ratio = drop_ratio;
    opt.XA_drop_ratio = XA_drop_ratio;
    opt.mask_level_redun = mask_level_redun;
    opt.max_XA_hits = max_XA_hits; opt.max_XA_hits_alt = max_XA_hits_alt;
    opt.mapQ_coef_len = mapQ_coef_len; opt.mapQ_coef_fac = mapQ_coef_fac;
    opt.flag = flag;
    std::memcpy(opt.mat, mat, 25);
    Bns bns{ann_off, ann_len, ann_is_alt, names, name_off, n_seqs, l_pac};

    std::vector<uint8_t> qtmp, ttmp, zbuf, qread;
    std::vector<int32_t> Hbuf, Ebuf;
    std::vector<Reg> regs;
    std::vector<Job> jobs;
    int64_t n_rec = 0, md_used = 0, xa_used = 0;
    int64_t row = 0;

    for (int64_t pi = 0; pi < n_proc; ++pi) {
        const int32_t i = proc_reads[pi];
        // advance to this read's rows (rows are read-major)
        while (row < n_rows && rr_read[row] < i) ++row;
        regs.clear();
        while (row < n_rows && rr_read[row] == i) {
            Reg r;
            r.rb = rr_rb[row]; r.re = rr_re[row];
            r.qb = rr_qb[row]; r.qe = rr_qe[row];
            r.rid = rr_rid[row]; r.score = rr_score[row];
            r.truesc = rr_truesc[row]; r.w = rr_w[row];
            r.seedcov = rr_seedcov[row]; r.seedlen0 = rr_seedlen0[row];
            r.is_alt = ann_is_alt[r.rid] != 0;
            r.frac_rep = frac_rep[i];
            regs.push_back(r);
            ++row;
        }
        const int l_query = lens[i];
        const int32_t* crow = codes + (int64_t)i * codes_stride;
        qread.resize(l_query);
        for (int k = 0; k < l_query; ++k) qread[k] = (uint8_t)crow[k];
        const uint8_t* query = qread.data();

        sort_dedup_patch(opt, bns, ref_string, query, regs, qtmp, ttmp,
                         zbuf, Hbuf, Ebuf);
        mark_primary(opt, regs, read_ids[i]);
        if (opt.flag & MEM_F_PRIMARY5) reorder_primary5(opt.T, regs);

        const int n = (int)regs.size();
        // XA planning (pipeline/finalize.py begin_batch)
        std::vector<int> cnt(n, 0);
        std::vector<uint8_t> has_alt(n, 0);
        std::vector<int> xa_k, xa_r;          // candidate -> primary
        auto pri_idx = [&](int k) -> int {
            int r = regs[k].secondary_all;
            if (r >= 0 && regs[k].score >= regs[r].score * opt.XA_drop_ratio)
                return r;
            return -1;
        };
        if (!(opt.flag & MEM_F_ALL)) {
            for (int k = 0; k < n; ++k) {
                int r = pri_idx(k);
                if (r >= 0) {
                    ++cnt[r];
                    if (regs[k].is_alt) has_alt[r] = 1;
                }
            }
            for (int k = 0; k < n; ++k) {
                int r = pri_idx(k);
                if (r < 0) continue;
                if (cnt[r] > opt.max_XA_hits_alt
                    || (!has_alt[r] && cnt[r] > opt.max_XA_hits))
                    continue;
                xa_k.push_back(k);
                xa_r.push_back(r);
            }
        }
        // output selection (mem_reg2sam)
        std::vector<int> sel_k;
        for (int k = 0; k < n; ++k) {
            const Reg& p = regs[k];
            if (p.score < opt.T) continue;
            if (p.secondary >= 0
                && (p.is_alt || !(opt.flag & MEM_F_ALL)))
                continue;
            if (p.secondary >= 0 && p.secondary < SEC_ALT
                && p.score < regs[p.secondary].score * opt.drop_ratio)
                continue;
            sel_k.push_back(k);
        }
        // run jobs
        jobs.clear();
        jobs.resize(xa_k.size() + sel_k.size());
        std::vector<int8_t> job_ok(jobs.size(), 0);
        for (size_t t_ = 0; t_ < xa_k.size(); ++t_)
            job_ok[t_] = make_job(opt, bns, ref_string, query, l_query,
                                  regs[xa_k[t_]], &jobs[t_]);
        for (size_t t_ = 0; t_ < sel_k.size(); ++t_)
            job_ok[xa_k.size() + t_] =
                make_job(opt, bns, ref_string, query, l_query,
                         regs[sel_k[t_]], &jobs[xa_k.size() + t_]);
        for (size_t t_ = 0; t_ < jobs.size(); ++t_)
            if (job_ok[t_]) resolve_job(opt, jobs[t_], zbuf, Hbuf, Ebuf);

        // XA strings keyed by primary index
        std::vector<std::string> xa_strings(n);
        for (size_t t_ = 0; t_ < xa_k.size(); ++t_) {
            if (!job_ok[t_]) continue;
            AlnOut t;
            if (!job_to_aln(opt, bns, jobs[t_], l_query, &t)) return -2;
            std::string& s = xa_strings[xa_r[t_]];
            s += names + name_off[t.rid];
            s += ',';
            s += t.is_rev ? '-' : '+';
            s += std::to_string(t.pos + 1);
            s += ',';
            static const char opc[] = "MIDSHN";
            for (uint32_t c : t.cig) {
                s += std::to_string(c >> 4);
                s += opc[c & 0xf];
            }
            s += ',';
            s += std::to_string(t.nm);
            s += ';';
        }
        // records
        int32_t nrec_i = 0, l = 0, rec0_mapq = 0;
        for (size_t t_ = 0; t_ < sel_k.size(); ++t_) {
            if (!job_ok[xa_k.size() + t_]) continue;
            const Reg& p = regs[sel_k[t_]];
            AlnOut q;
            if (!job_to_aln(opt, bns, jobs[xa_k.size() + t_], l_query,
                            &q))
                return -2;
            q.flag |= extra_flag;
            if (p.secondary >= 0) q.sub = -1;
            if (l && p.secondary < 0)
                q.flag |= (opt.flag & MEM_F_NO_MULTI) ? 0x10000 : 0x800;
            if (!(opt.flag & MEM_F_KEEP_SUPP_MAPQ) && l && !p.is_alt
                && q.mapq > rec0_mapq)
                q.mapq = rec0_mapq;
            if (l == 0) rec0_mapq = q.mapq;
            // emit
            if (n_rec >= rec_cap || (int32_t)q.cig.size() > cig_stride)
                return -1;
            const std::string& xs = xa_strings[sel_k[t_]];
            if (md_used + (int64_t)q.md.size() > md_cap
                || xa_used + (int64_t)xs.size() > xa_cap)
                return -1;
            rec_read[n_rec] = i;
            rec_rid[n_rec] = q.rid;
            rec_pos[n_rec] = q.pos;
            rec_flag[n_rec] = q.flag;
            rec_mapq[n_rec] = q.mapq;
            rec_score[n_rec] = q.score;
            rec_sub[n_rec] = q.sub;
            rec_nm[n_rec] = q.nm;
            rec_alt_sc[n_rec] = q.alt_sc;
            rec_is_rev[n_rec] = q.is_rev;
            rec_is_alt[n_rec] = q.is_alt;
            rec_ncig[n_rec] = (int32_t)q.cig.size();
            std::memcpy(cig_out + n_rec * cig_stride, q.cig.data(),
                        q.cig.size() * sizeof(uint32_t));
            std::memcpy(md_arena + md_used, q.md.data(), q.md.size());
            rec_md_off[n_rec] = md_used;
            rec_md_len[n_rec] = (int32_t)q.md.size();
            md_used += (int64_t)q.md.size();
            std::memcpy(xa_arena + xa_used, xs.data(), xs.size());
            rec_xa_off[n_rec] = xa_used;
            rec_xa_len[n_rec] = (int32_t)xs.size();
            xa_used += (int64_t)xs.size();
            ++l;
            ++nrec_i;
            ++n_rec;
        }
        if (nrec_i == 0) {
            if (n_rec >= rec_cap) return -1;
            rec_read[n_rec] = i;
            rec_rid[n_rec] = -1;
            rec_pos[n_rec] = -1;
            rec_flag[n_rec] = 0x4 | extra_flag;
            rec_mapq[n_rec] = 0;
            rec_score[n_rec] = -1;
            rec_sub[n_rec] = -1;
            rec_nm[n_rec] = -1;
            rec_alt_sc[n_rec] = 0;
            rec_is_rev[n_rec] = 0;
            rec_is_alt[n_rec] = 0;
            rec_ncig[n_rec] = 0;
            rec_md_off[n_rec] = md_used;
            rec_md_len[n_rec] = 0;
            rec_xa_off[n_rec] = xa_used;
            rec_xa_len[n_rec] = 0;
            nrec_i = 1;
            ++n_rec;
        }
        rd_nrec[pi] = nrec_i;
    }
    return n_rec;
}

}  // extern "C"

// ---- SAM text composition (mem_aln2sam, io/sam.py:52-145) ----------
//
// Composes final SE SAM lines straight from the flat record arrays
// finalize_se_batch produced (plus EMF perfect-hit records appended
// by the caller as synthetic rows). Per processed read, all its
// records' lines are concatenated into the shared text arena with
// one (off, len) per read. Returns bytes used, or -1 on arena
// overflow (caller falls back to the Python writer).

namespace {

inline void put_u32(std::string& s, uint32_t v) { s += std::to_string(v); }
inline void put_i64(std::string& s, int64_t v) { s += std::to_string(v); }

const char NT_FWD[] = "ACGTN";
const char NT_REV[] = "TGCAN";
const char CIG_OP[] = "MIDSHN";

}  // namespace

extern "C" {

int64_t compose_sam_se(
    // records (read-major, grouped)
    int64_t n_rec, const int32_t* rec_read, const int32_t* rec_rid,
    const int64_t* rec_pos, const int32_t* rec_flag,
    const int32_t* rec_mapq, const int32_t* rec_score,
    const int32_t* rec_sub, const int32_t* rec_nm,
    const int32_t* rec_alt_sc, const uint8_t* rec_is_rev,
    const uint8_t* rec_is_alt, const int32_t* rec_ncig,
    const uint32_t* cig_out, int32_t cig_stride,
    const char* md_arena, const int64_t* rec_md_off,
    const int32_t* rec_md_len, const char* xa_arena,
    const int64_t* rec_xa_off, const int32_t* rec_xa_len,
    // per-read inputs
    const int32_t* codes, int64_t codes_stride, const int32_t* lens,
    const char* qname_blob, const int64_t* qname_off,   // [B+1]
    const char* qual_blob, const int64_t* qual_off,     // nullable
    // contig names
    const char* names, const int64_t* name_off,
    // options
    int32_t opt_flag, const char* rg_id,
    // output
    char* sam_arena, int64_t sam_cap,
    int64_t* read_off, int32_t* read_len) {
    constexpr int32_t F_SOFTCLIP = 0x200;
    constexpr int32_t F_NO_MULTI_MARK = 0x10000;
    std::string line;
    std::string seqbuf, qualbuf;
    int64_t used = 0;
    int64_t r0 = 0;
    while (r0 < n_rec) {
        const int32_t i = rec_read[r0];
        int64_t r1 = r0;
        while (r1 < n_rec && rec_read[r1] == i) ++r1;
        const int nrec = (int)(r1 - r0);
        const int l_seq = lens[i];
        const int32_t* crow = codes + (int64_t)i * codes_stride;
        const int64_t rd_start = used;
        for (int which = 0; which < nrec; ++which) {
            const int64_t r = r0 + which;
            int32_t flag = rec_flag[r];
            const bool mapped = rec_rid[r] >= 0;
            if (!mapped) flag |= 0x4;
            if (rec_is_rev[r]) flag |= 0x10;
            line.clear();
            // QNAME, FLAG
            line.append(qname_blob + qname_off[i],
                        qname_off[i + 1] - qname_off[i]);
            line += '\t';
            put_u32(line, (uint32_t)((flag & 0xFFFF)
                                     | ((flag & F_NO_MULTI_MARK) ? 0x100
                                                                 : 0)));
            line += '\t';
            const int ncig = rec_ncig[r];
            const uint32_t* cig = cig_out + r * cig_stride;
            if (mapped) {
                line += names + name_off[rec_rid[r]];
                line += '\t';
                put_i64(line, rec_pos[r] + 1);
                line += '\t';
                put_u32(line, (uint32_t)rec_mapq[r]);
                line += '\t';
                if (ncig == 0) {
                    line += '*';
                } else {
                    for (int c = 0; c < ncig; ++c) {
                        uint32_t op = cig[c] & 0xF;
                        if (!(opt_flag & F_SOFTCLIP) && !rec_is_alt[r]
                            && (op == 3 || op == 4))
                            op = which ? 4 : 3;
                        put_u32(line, cig[c] >> 4);
                        line += CIG_OP[op];
                    }
                }
            } else {
                line += "*\t0\t0\t*";
            }
            line += "\t*\t0\t0\t";   // SE: no mate columns
            // SEQ/QUAL
            if (flag & 0x100) {
                line += "*\t*";
            } else {
                int qb = 0, qe = l_seq;
                if (ncig && which && !(opt_flag & F_SOFTCLIP)
                    && !rec_is_alt[r]) {
                    const uint32_t f_op = cig[0] & 0xF,
                                   l_op = cig[ncig - 1] & 0xF;
                    const int32_t f_ln = cig[0] >> 4,
                                  l_ln = cig[ncig - 1] >> 4;
                    if (!rec_is_rev[r]) {
                        if (f_op == 3 || f_op == 4) qb += f_ln;
                        if (l_op == 3 || l_op == 4) qe -= l_ln;
                    } else {
                        if (f_op == 3 || f_op == 4) qe -= f_ln;
                        if (l_op == 3 || l_op == 4) qb += l_ln;
                    }
                }
                seqbuf.clear();
                if (!rec_is_rev[r]) {
                    for (int k = qb; k < qe; ++k) {
                        int32_t c = crow[k];
                        seqbuf += NT_FWD[c > 4 ? 4 : c];
                    }
                } else {
                    for (int k = qe - 1; k >= qb; --k) {
                        int32_t c = crow[k];
                        seqbuf += NT_REV[c > 4 ? 4 : c];
                    }
                }
                line += seqbuf;
                line += '\t';
                if (qual_blob) {
                    const char* qs = qual_blob + qual_off[i];
                    const int64_t ql = qual_off[i + 1] - qual_off[i];
                    if (ql == 0) {
                        line += '*';
                    } else if (!rec_is_rev[r]) {
                        line.append(qs + qb, qe - qb);
                    } else {
                        for (int k = qe - 1; k >= qb; --k) line += qs[k];
                    }
                } else {
                    line += '*';
                }
            }
            // tags
            if (ncig) {
                line += "\tNM:i:";
                put_u32(line, (uint32_t)rec_nm[r]);
                line += "\tMD:Z:";
                line.append(md_arena + rec_md_off[r], rec_md_len[r]);
            }
            if (rec_score[r] >= 0) {
                line += "\tAS:i:";
                put_u32(line, (uint32_t)rec_score[r]);
            }
            if (rec_sub[r] >= 0) {
                line += "\tXS:i:";
                put_u32(line, (uint32_t)rec_sub[r]);
            }
            if (rg_id && *rg_id) {
                line += "\tRG:Z:";
                line += rg_id;
            }
            if (!(flag & 0x100)) {
                bool any_other = false;
                for (int o = 0; o < nrec; ++o)
                    if (o != which && !(rec_flag[r0 + o] & 0x100))
                        any_other = true;
                if (any_other) {
                    line += "\tSA:Z:";
                    for (int o = 0; o < nrec; ++o) {
                        const int64_t rr = r0 + o;
                        if (o == which || (rec_flag[rr] & 0x100))
                            continue;
                        line += names + name_off[rec_rid[rr]];
                        line += ',';
                        put_i64(line, rec_pos[rr] + 1);
                        line += ',';
                        line += rec_is_rev[rr] ? '-' : '+';
                        line += ',';
                        const uint32_t* oc = cig_out + rr * cig_stride;
                        for (int c = 0; c < rec_ncig[rr]; ++c) {
                            put_u32(line, oc[c] >> 4);
                            line += CIG_OP[oc[c] & 0xF];
                        }
                        line += ',';
                        put_u32(line, (uint32_t)rec_mapq[rr]);
                        line += ',';
                        put_u32(line, (uint32_t)rec_nm[rr]);
                        line += ';';
                    }
                }
                if (rec_alt_sc[r] > 0) {
                    char buf[40];
                    snprintf(buf, sizeof buf, "\tpa:f:%.3f",
                             (double)rec_score[r] / rec_alt_sc[r]);
                    line += buf;
                }
            }
            if (rec_xa_len[r]) {
                line += "\tXA:Z:";
                line.append(xa_arena + rec_xa_off[r], rec_xa_len[r]);
            }
            line += '\n';
            if (used + (int64_t)line.size() > sam_cap) return -1;
            std::memcpy(sam_arena + used, line.data(), line.size());
            used += (int64_t)line.size();
        }
        read_off[i] = rd_start;
        read_len[i] = (int32_t)(used - rd_start);
        r0 = r1;
    }
    return used;
}

}  // extern "C"
