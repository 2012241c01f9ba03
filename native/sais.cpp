// SA-IS suffix array construction (64-bit indices).
//
// Native index-build component of bwa-mem-scale-tpu: the counterpart of
// the reference's saisxx/is.c suffix sorting (reference:
// src/sais.h:557, src/is.cpp) used by FMI_search::build_index. Written
// from scratch per Nong/Zhang/Chan's SA-IS algorithm ("Two Efficient
// Algorithms for Linear Time Suffix Array Construction", 2011).
//
// Suffix order convention: implicit sentinel smaller than every symbol
// (proper prefixes sort first), matching the BWT build. Equivalently,
// the last suffix is L-type and seeds the L-induction as the
// predecessor of the virtual sentinel.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsais.so sais.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

template <typename CharT>
static void sais_rec(const CharT* T, i64* SA, i64 n, i64 K) {
    if (n == 0) return;
    if (n == 1) { SA[0] = 0; return; }

    // classify: t[i] = 1 iff suffix i is S-type. The virtual sentinel is
    // smaller than everything, so suffix n-1 is L-type.
    std::vector<uint8_t> t(n);
    t[n - 1] = 0;
    for (i64 i = n - 2; i >= 0; --i)
        t[i] = (T[i] < T[i + 1]) || (T[i] == T[i + 1] && t[i + 1]);

    auto is_lms = [&](i64 i) { return i > 0 && t[i] && !t[i - 1]; };

    std::vector<i64> bkt(K, 0), cur(K);
    for (i64 i = 0; i < n; ++i) bkt[(i64)T[i]]++;
    auto heads = [&]() {
        i64 sum = 0;
        for (i64 c = 0; c < K; ++c) { cur[c] = sum; sum += bkt[c]; }
    };
    auto tails = [&]() {
        i64 sum = 0;
        for (i64 c = 0; c < K; ++c) { sum += bkt[c]; cur[c] = sum; }
    };

    auto induce = [&]() {
        // L-induction; the virtual sentinel's predecessor n-1 leads.
        heads();
        SA[cur[(i64)T[n - 1]]++] = n - 1;
        for (i64 i = 0; i < n; ++i) {
            i64 j = SA[i];
            if (j > 0 && !t[j - 1]) SA[cur[(i64)T[j - 1]]++] = j - 1;
        }
        // S-induction.
        tails();
        for (i64 i = n - 1; i >= 0; --i) {
            i64 j = SA[i];
            if (j > 0 && t[j - 1]) SA[--cur[(i64)T[j - 1]]] = j - 1;
        }
    };

    // step 1: approximate sort — place LMS suffixes at bucket tails.
    std::memset(SA, -1, sizeof(i64) * n);
    tails();
    for (i64 i = n - 1; i >= 1; --i)
        if (is_lms(i)) SA[--cur[(i64)T[i]]] = i;
    induce();

    // step 2: compact sorted LMS substring starts, then name them.
    i64 n1 = 0;
    for (i64 i = 0; i < n; ++i) {
        i64 j = SA[i];
        if (j > 0 && is_lms(j)) SA[n1++] = j;
    }
    std::memset(SA + n1, -1, sizeof(i64) * (n - n1));
    i64 name = 0, prev = -1;
    for (i64 i = 0; i < n1; ++i) {
        i64 pos = SA[i];
        bool diff = false;
        if (prev < 0) diff = true;
        else {
            for (i64 d = 0;; ++d) {
                if (pos + d == n || prev + d == n) {
                    diff = !(pos + d == n && prev + d == n);
                    break;
                }
                if (T[pos + d] != T[prev + d]
                    || t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) { ++name; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    for (i64 i = n - 1, j = n - 1; i >= n1; --i)
        if (SA[i] >= 0) SA[j--] = SA[i];

    // step 3: recurse on the reduced string if names repeat.
    i64* SA1 = SA;
    i64* s1 = SA + n - n1;
    if (name < n1) {
        std::vector<i64> s1copy(s1, s1 + n1);
        sais_rec<i64>(s1copy.data(), SA1, n1, name);
    } else {
        for (i64 i = 0; i < n1; ++i) SA1[s1[i]] = i;
    }

    // map reduced SA back to text LMS positions.
    {
        i64 j = 0;
        for (i64 i = 1; i < n; ++i)
            if (is_lms(i)) s1[j++] = i;
        for (i64 i = 0; i < n1; ++i) SA1[i] = s1[SA1[i]];
    }

    // step 4: exact induction from fully sorted LMS suffixes.
    std::memset(SA + n1, -1, sizeof(i64) * (n - n1));
    tails();
    for (i64 i = n1 - 1; i >= 0; --i) {
        i64 j = SA[i];
        SA[i] = -1;
        SA[--cur[(i64)T[j]]] = j;
    }
    induce();
}

}  // namespace

extern "C" {

int sais_u8(const uint8_t* T, int64_t* SA, int64_t n, int64_t alphabet) {
    if (n < 0 || !T || !SA) return -1;
    sais_rec<uint8_t>(T, SA, n, alphabet);
    return 0;
}

}  // extern "C"
