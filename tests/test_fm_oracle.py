"""FM-index build + oracle search correctness against brute force."""

import numpy as np
import pytest

from bwa_mem_scale_tpu.index.build import (
    suffix_array_doubling, bwt_from_sa, build_cp_occ, build_index)
from bwa_mem_scale_tpu.index.artifacts import CP_BLOCK_SIZE
from bwa_mem_scale_tpu.ref.fm import FMOracle, Smem
from bwa_mem_scale_tpu.config import MemOptions

from conftest import make_genome, sample_reads


def brute_occ(bwt, pos, c):
    return int(np.sum(bwt[:pos] == c))


def test_suffix_array_small():
    text = np.array([1, 0, 2, 2, 0, 1, 0], dtype=np.uint8)  # CAGGACA
    sa = suffix_array_doubling(text)
    n = len(text)
    # Verify sorted order of suffixes (with sentinel < everything).
    suffixes = [tuple(text[i:]) for i in range(n)] + [()]
    order = sorted(range(n + 1), key=lambda i: suffixes[i] if i < n else ())
    assert sa[0] == n
    expect = sorted(range(n + 1), key=lambda i: tuple(text[i:]))
    assert list(sa) == expect


def test_bwt_and_occ(small_genome):
    text = small_genome.full_text()[:2048]
    sa = suffix_array_doubling(text)
    bwt, sent = bwt_from_sa(text, sa)
    assert bwt[sent] == 4
    cp_count, cp_mask = build_cp_occ(bwt)

    idx_like = type("X", (), {})()
    # Build a minimal FMIndex-like for occ testing via FMOracle internals.
    from bwa_mem_scale_tpu.index.artifacts import FMIndex
    from bwa_mem_scale_tpu.index.bntseq import BntSeq, Annotation
    bns = BntSeq(l_pac=1024, anns=[Annotation("c", "", 0, 1024, 0)],
                 ambs=[], seq=text[:1024])
    count = np.zeros(5, dtype=np.int64)
    count[1:] = np.cumsum(np.bincount(text, minlength=4)[:4])
    count += 1
    fmi = FMIndex(seq_len=len(text) + 1, count=count, cp_count=cp_count,
                  cp_mask=cp_mask, sa_samples=sa[::8].astype(np.int64),
                  sa_compx=3, sentinel_index=sent, bns=bns, ref_string=text)
    fm = FMOracle(fmi)
    rng = np.random.RandomState(0)
    for _ in range(200):
        pos = rng.randint(0, len(bwt))
        c = rng.randint(0, 4)
        assert fm.occ(pos, c) == brute_occ(bwt, pos, c)


def brute_interval(text_sa, text, pattern):
    """All suffix-array rows whose suffix starts with pattern."""
    hits = []
    for r, p in enumerate(text_sa):
        if tuple(text[p: p + len(pattern)]) == tuple(pattern):
            hits.append(r)
    return hits


def test_backward_ext_matches_brute(small_index):
    fm = FMOracle(small_index)
    text = small_index.ref_string
    sa = suffix_array_doubling(text)
    rng = np.random.RandomState(1)
    for _ in range(20):
        plen = rng.randint(1, 6)
        pos = rng.randint(0, len(text) - plen)
        pat = text[pos: pos + plen]
        # Start from last base, extend backward.
        a = int(pat[-1])
        sm = Smem(0, 0, 0, k=int(fm.count[a]), l=int(fm.count[3 - a]),
                  s=int(fm.count[a + 1] - fm.count[a]))
        for j in range(plen - 2, -1, -1):
            sm = fm.backward_ext(sm, int(pat[j]))
        rows = brute_interval(sa, text, pat)
        assert sm.s == len(rows)
        if rows:
            assert sm.k == rows[0]
            assert sm.k + sm.s - 1 == rows[-1]


def test_sa_lookup(small_index):
    fm = FMOracle(small_index)
    text = small_index.ref_string
    sa = suffix_array_doubling(text)
    rng = np.random.RandomState(2)
    for pos in rng.randint(0, len(sa), size=100):
        assert fm.sa_entry(int(pos)) == int(sa[pos])


def brute_maximal_exact_matches(text, query, min_len, x):
    """All maximal exact matches of query covering position x."""
    out = set()
    tset = text.tobytes()
    for m in range(0, x + 1):
        for n in range(x, len(query)):
            sub = query[m: n + 1].tobytes()
            if sub not in tset:
                continue
            left_ext = (m > 0 and query[m - 1: n + 1].tobytes() in tset)
            right_ext = (n + 1 < len(query)
                         and query[m: n + 2].tobytes() in tset)
            if not left_ext and not right_ext and (n - m + 1) >= min_len:
                out.add((m, n))
    return out


def test_smem_maximality(small_index):
    """Pass-1 SMEMs are exactly the maximal exact matches >= min_seed_len.

    4 reads in the quick gate (the brute-force cross-product is
    O(reads * len^2 * text)); the 12-read sweep runs in the slow suite
    (test_smem_maximality_full)."""
    _smem_maximality(small_index, n_reads=4)


@pytest.mark.slow
def test_smem_maximality_full(small_index):
    _smem_maximality(small_index, n_reads=12)


def _smem_maximality(small_index, n_reads):
    fm = FMOracle(small_index)
    text = small_index.ref_string
    reads = sample_reads(small_index.bns, n_reads, 80, seed=3,
                         err_rate=0.03)
    opt = MemOptions()
    for codes, _, _ in reads:
        smems = fm.smems_all_pos(codes, 0, 1, opt.min_seed_len)
        got = {(s.m, s.n) for s in smems}
        want = set()
        # Union of maximal matches over all covering positions.
        x = 0
        while x < len(codes):
            mems = brute_maximal_exact_matches(text, codes,
                                               opt.min_seed_len, x)
            want |= mems
            x += 1
        assert got == want


def test_smem_intervals_consistent(small_index):
    fm = FMOracle(small_index)
    text = small_index.ref_string
    sa = suffix_array_doubling(text)
    reads = sample_reads(small_index.bns, 5, 60, seed=4, err_rate=0.02)
    opt = MemOptions()
    for codes, _, _ in reads:
        for sm in fm.smems_all_pos(codes, 0, 1, opt.min_seed_len):
            pat = codes[sm.m: sm.n + 1]
            rows = brute_interval(sa, text, pat)
            assert sm.s == len(rows) and sm.k == rows[0]
            # SA entries point at true occurrences.
            for coord in fm.sa_entries(sm, opt.max_occ):
                assert tuple(text[coord: coord + len(pat)]) == tuple(pat)
