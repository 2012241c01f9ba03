// Native EMF (perfect-match) canonicalization + grouping.
//
// Host index-build component: the counterpart of the reference's
// multithreaded perfect-index hashing (reference:
// src/perfect_index.cpp:1045-1166 calc_loc_key/add_to_hash). Computes
// per-window canonical orientation and the 64-bit mixed hash (bit-
// exactly matching bwa_mem_scale_tpu/index/perfect.py pack_words/
// hash_words), sorts positions by hash, verifies equal-hash runs by
// comparing the actual canonical windows, and assigns group ids.
// Python finishes the (group-sized, cheap) table construction.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libemf.so emf.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

using u64 = uint64_t;
using i64 = int64_t;

static inline u64 fmix64(u64 k) {
    k ^= k >> 33;
    k *= 0xFF51AFD7ED558CCDULL;
    k ^= k >> 33;
    k *= 0xC4CEB9FE1A85EC53ULL;
    k ^= k >> 33;
    return k;
}

constexpr u64 MG = 0x9E3779B97F4A7C15ULL;

// canonical orientation: forward window <= its reverse complement
static inline bool fw_less(const uint8_t* s, int S) {
    for (int i = 0; i < S; ++i) {
        uint8_t f = s[i];
        uint8_t r = 3 - s[S - 1 - i];
        if (f != r) return f < r;
    }
    return true;
}

// hash of the canonical window (matches pack_words + hash_words)
static inline u64 canon_hash(const uint8_t* s, int S, bool fwless) {
    int W = (S + 31) / 32;
    u64 h = (u64)S;
    for (int w = 0; w < W; ++w) {
        u64 word = 0;
        for (int i = 0; i < 32; ++i) {
            int j = w * 32 + i;
            u64 b = 0;
            if (j < S) b = fwless ? s[j] : (u64)(3 - s[S - 1 - j]);
            word |= b << (2 * (31 - i));
        }
        h = fmix64((h ^ word) * MG);
    }
    return h;
}

// lexicographic compare of two canonical windows
static inline int canon_cmp(const uint8_t* seq, i64 a, bool afw,
                            i64 b, bool bfw, int S) {
    for (int i = 0; i < S; ++i) {
        uint8_t ca = afw ? seq[a + i] : 3 - seq[a + S - 1 - i];
        uint8_t cb = bfw ? seq[b + i] : 3 - seq[b + S - 1 - i];
        if (ca != cb) return ca < cb ? -1 : 1;
    }
    return 0;
}

}  // namespace

extern "C" {

// positions: int64[n_pos] window starts (contig-filtered by caller).
// Outputs: fwless uint8[n_pos], gid int64[n_pos] (group ids are dense
// but arbitrary order), hash u64 via out_hash (for the table build).
// Returns the number of groups.
// grp_rep/grp_cnt: per-group min position and size (first n_groups
// entries valid; buffers sized n_pos by the caller).
i64 emf_group(const uint8_t* seq, const i64* positions, i64 n_pos,
              int32_t S, uint8_t* fwless, u64* out_hash, i64* gid,
              i64* grp_rep, i64* grp_cnt) {
    int nt = (int)std::max(1u, std::thread::hardware_concurrency());
    {
        std::vector<std::thread> th;
        i64 chunk = (n_pos + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            i64 lo = t * chunk, hi = std::min(n_pos, lo + chunk);
            if (lo >= hi) break;
            th.emplace_back([&, lo, hi]() {
                for (i64 i = lo; i < hi; ++i) {
                    const uint8_t* w = seq + positions[i];
                    bool f = fw_less(w, S);
                    fwless[i] = f;
                    out_hash[i] = canon_hash(w, S, f);
                }
            });
        }
        for (auto& x : th) x.join();
    }

    // sort positions by (hash, position) for deterministic runs
    std::vector<i64> order(n_pos);
    for (i64 i = 0; i < n_pos; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](i64 a, i64 b) {
        if (out_hash[a] != out_hash[b]) return out_hash[a] < out_hash[b];
        return positions[a] < positions[b];
    });

    // group: equal hash AND equal canonical window. Within an
    // equal-hash run, distinct windows are sub-grouped by full
    // compare against each open sub-group representative (runs are
    // tiny; 64-bit collisions are rare).
    i64 n_grp = 0;
    i64 i = 0;
    std::vector<i64> reps;  // representative order-index per subgroup
    while (i < n_pos) {
        i64 j = i;
        while (j < n_pos && out_hash[order[j]] == out_hash[order[i]])
            ++j;
        reps.clear();
        for (i64 k = i; k < j; ++k) {
            i64 oi = order[k];
            i64 found = -1;
            for (i64 r : reps) {
                i64 orp = order[r];
                if (canon_cmp(seq, positions[oi], fwless[oi],
                              positions[orp], fwless[orp], S) == 0) {
                    found = gid[orp];
                    break;
                }
            }
            if (found < 0) {
                found = n_grp++;
                reps.push_back(k);
                grp_rep[found] = positions[oi];
                grp_cnt[found] = 0;
            }
            gid[oi] = found;
            if (positions[oi] < grp_rep[found])
                grp_rep[found] = positions[oi];
            grp_cnt[found] += 1;
        }
        i = j;
    }
    return n_grp;
}

// Sequential linear-probe insertion by ascending group id into a
// power-of-two table (the counterpart of the reference's
// add_to_hash, src/perfect_index.cpp:1166). tab must be -1-filled.
// Returns the maximum probe count used.
i64 emf_insert(const u64* grp_h, i64 n_grp, i64 ncap, i64* tab) {
    u64 mask = (u64)ncap - 1;
    i64 maxp = 1;
    for (i64 g = 0; g < n_grp; ++g) {
        u64 s = grp_h[g] & mask;
        i64 p = 1;
        while (tab[s] >= 0) {
            s = (s + 1) & mask;
            ++p;
        }
        tab[s] = g;
        if (p > maxp) maxp = p;
    }
    return maxp;
}

// Streaming chunked insertion directly into the persistent table
// arrays (genome-scale builds can't materialize all positions at
// once; the reference streams with a producer/consumer pipeline,
// src/perfect_index.cpp:1317-1437). Chunks arrive in ascending
// position order; groups within a chunk are inserted in ascending
// representative-position order (grp_order), so an entry's stored
// location is always its globally-smallest position. Same-seed
// groups from later chunks MERGE into the existing entry (same
// canonical window verified by full compare — a 32-bit fp match
// alone keeps probing). New entries claim empty slots only while
// n_entries < budget (the MEMSCALE partial-EMF analogue,
// src/bwa_shm.cpp:1585-1770 pt_num_seed_entry_loaded); over-budget
// groups are skipped (those seeds miss -> normal seeding path).
// Members beyond an entry's stored location are appended to the
// merge log (slot, position, same-orientation) for multi-location
// list construction by the caller.
// state[0]=n_entries, state[1]=max_probe. Returns the number of log
// records written, or -1 if mlog_cap would overflow.
i64 emf_insert_chunk(
    const uint8_t* seq, int32_t S,
    const i64* positions, const uint8_t* pos_fwless,
    const u64* grp_h, const i64* grp_rep, const i64* grp_cnt,
    i64 n_grp, const i64* grp_order,
    const i64* memb_idx, const i64* memb_off,
    i64* loc, uint32_t* fp, uint8_t* fwl, int32_t* cnt,
    i64 cap, i64 budget_entries, i64* state,
    i64* mlog_slot, i64* mlog_pos, uint8_t* mlog_same,
    i64 mlog_cap) {
    u64 mask = (u64)cap - 1;
    i64 n_log = 0;
    for (i64 oi = 0; oi < n_grp; ++oi) {
        i64 g = grp_order[oi];
        u64 h = grp_h[g];
        uint32_t f32 = (uint32_t)(h >> 32);
        u64 s = h & mask;
        i64 probe = 1;
        i64 hit = -1;      // slot merged into or claimed; -1 skipped
        bool claimed = false;
        for (;;) {
            if (loc[s] < 0) {
                if (state[0] >= budget_entries) break;  // budget full
                // the representative's fwless is that of its window
                // (members of one group can have either orientation
                // when the seed is its own revcomp neighbour; the
                // entry stores the rep's)
                loc[s] = grp_rep[g];
                fp[s] = f32;
                // rep is members[0] (ascending positions)
                fwl[s] = pos_fwless[memb_idx[memb_off[g]]];
                cnt[s] = (int32_t)grp_cnt[g];
                state[0] += 1;
                hit = (i64)s;
                claimed = true;
                break;
            }
            if (fp[s] == f32 &&
                canon_cmp(seq, loc[s], fwl[s] != 0,
                          grp_rep[g],
                          pos_fwless[memb_idx[memb_off[g]]] != 0,
                          S) == 0) {
                cnt[s] += (int32_t)grp_cnt[g];
                hit = (i64)s;
                break;
            }
            s = (s + 1) & mask;
            if (++probe > cap) break;   // table saturated
        }
        if (probe > state[1]) state[1] = probe;
        if (hit < 0) continue;
        // log members past the stored location (claim: skip the rep;
        // merge: every member)
        i64 mb = memb_off[g] + (claimed ? 1 : 0);
        i64 me = memb_off[g + 1];
        if (n_log + (me - mb) > mlog_cap) return -1;
        for (i64 m = mb; m < me; ++m) {
            i64 pi = memb_idx[m];
            mlog_slot[n_log] = hit;
            mlog_pos[n_log] = positions[pi];
            mlog_same[n_log] = (uint8_t)(pos_fwless[pi] == fwl[hit]);
            ++n_log;
        }
    }
    return n_log;
}

}  // extern "C"
