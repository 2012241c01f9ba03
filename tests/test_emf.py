"""EMF (perfect-match filter) — device lookup codes, multi-location
resolution, and SAM-path concordance with the normal pipeline
(the reference's DO_NORMAL differential contract, src/perfect.h:51-56).
"""

import numpy as np
import pytest

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.bntseq import BntSeq, Annotation
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.index.perfect import (build_perfect_table,
                                             save_perfect_table,
                                             load_perfect_table)
from bwa_mem_scale_tpu.ops.emf import (DeviceEmf, emf_lookup, NO_TABLE,
                                       WITH_N, NOT_MATCHED, FW_MATCHED,
                                       RC_MATCHED)
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.pipeline.perfect import (perfect_locations,
                                                perfect_sam_records,
                                                perfect_regs)


S = 48


@pytest.fixture(scope="module")
def emf_setup():
    bns = make_genome(30000, seed=5)
    idx = build_index(bns)
    pt = build_perfect_table(idx, seed_len=S)
    return idx, pt


def _lookup(idx, pt, codes, lens):
    import jax.numpy as jnp
    demf = DeviceEmf.from_host(pt)
    fmi = DeviceFMIndex.from_host(idx)
    out = emf_lookup(demf, fmi.ref, jnp.asarray(codes, jnp.int32),
                     jnp.asarray(lens, jnp.int32))
    return {k: np.asarray(v) for k, v in out.items()}


def test_lookup_codes(emf_setup, tmp_path):
    idx, pt = emf_setup
    # round-trip the artifact
    pt = load_perfect_table(save_perfect_table(pt, str(tmp_path / "i")))
    bns = idx.bns
    reads = sample_reads(bns, 40, S, seed=9, err_rate=0.0)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(40, S, dtype=np.int32)
    truth = [(p, rev) for _, p, rev in reads]
    # lane 0: inject N; lane 1: inject error
    codes[0, 10] = 4
    codes[1, 20] = (codes[1, 20] + 2) % 4

    out = _lookup(idx, pt, codes, lens)
    assert out["code"][0] == WITH_N
    # an error almost surely misses (unless the mutated read exists)
    assert out["code"][1] in (NOT_MATCHED, FW_MATCHED, RC_MATCHED)
    n_hit = 0
    for i in range(2, 40):
        p, rev = truth[i]
        assert out["code"][i] == (RC_MATCHED if rev else FW_MATCHED), i
        n_hit += 1
        # matched location: seed loc of some exact occurrence; for a
        # random genome it is the sampled position itself
        assert out["loc"][i] == p, i
    assert n_hit == 38


def test_lookup_longer_than_seed(emf_setup):
    idx, pt = emf_setup
    L = 72
    reads = sample_reads(idx.bns, 20, L, seed=10, err_rate=0.0)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(20, L, dtype=np.int32)
    out = _lookup(idx, pt, codes, lens)
    for i, (_, p, rev) in enumerate(reads):
        want = RC_MATCHED if rev else FW_MATCHED
        assert out["code"][i] == want, i
        # entry loc is the seed location; fw start = loc - ext for rc
        start = out["loc"][i] - (L - S if rev else 0)
        assert start == p, i
    # a read shorter than the seed -> NO_TABLE
    lens2 = lens.copy()
    lens2[0] = S - 5
    out2 = _lookup(idx, pt, codes, lens2)
    assert out2["code"][0] == NO_TABLE


def test_multi_location(tmp_path):
    # genome with an exact repeat: unit at positions p1 and p2 (fw)
    rng = np.random.RandomState(3)
    seq = rng.randint(0, 4, size=8000).astype(np.uint8)
    unit = rng.randint(0, 4, size=S + 10).astype(np.uint8)
    p1, p2 = 1000, 5000
    seq[p1: p1 + len(unit)] = unit
    seq[p2: p2 + len(unit)] = unit
    # and its reverse complement at p3
    p3 = 6500
    seq[p3: p3 + len(unit)] = (3 - unit[::-1])
    bns = BntSeq(l_pac=8000,
                 anns=[Annotation(name="c", anno="", offset=0,
                                  length=8000, n_ambs=0)],
                 ambs=[], seq=seq)
    idx = build_index(bns)
    pt = build_perfect_table(idx, seed_len=S)

    read = unit[:S].astype(np.int32)
    codes = read[None, :]
    lens = np.array([S], dtype=np.int32)
    out = _lookup(idx, pt, codes, lens)
    assert out["code"][0] in (FW_MATCHED, RC_MATCHED)
    assert out["n_loc"][0] == 3
    hits = perfect_locations(pt, idx.ref_string, read.astype(np.uint8),
                             int(out["code"][0]), int(out["slot"][0]))
    locs = sorted(h[0] for h in hits)
    assert locs == [p1, p2, p3 + 10]  # rc occurrence of unit[:S]
    # strand split: two fw + one rc (relative to the read)
    assert sorted(h[1] for h in hits) == [False, False, True]

    opt = MemOptions()
    recs = perfect_sam_records(opt, bns, pt, idx.ref_string,
                               read.astype(np.uint8),
                               int(out["code"][0]), int(out["slot"][0]))
    assert recs[0].mapq == 60 and recs[0].sub == S * opt.a
    assert recs[0].flag & 0x100 == 0
    regs = perfect_regs(opt, bns, pt, idx.ref_string,
                        read.astype(np.uint8),
                        int(out["code"][0]), int(out["slot"][0]))
    assert len(regs) == 3
    for r in regs:
        assert r.re - r.rb == S and r.score == S * opt.a


def test_sam_concordance(emf_setup):
    """Errorless reads through the EMF path must produce the same
    primary coordinates/CIGAR as the normal pipeline (MAPQ/XS may
    differ per the documented divergence)."""
    from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
    idx, pt = emf_setup
    opt = MemOptions()
    cfg = PipelineConfig(max_coords=64, max_chains=16,
                         max_seeds_per_chain=8, max_regs=16)
    L = 64
    reads = sample_reads(idx.bns, 16, L, seed=12, err_rate=0.0)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(16, L, dtype=np.int32)

    plain = TpuAligner(idx, opt, cfg)
    fast = TpuAligner(idx, opt, cfg, emf=pt)
    rec_p = plain.align_and_finalize(codes, lens)
    rec_f = fast.align_and_finalize(codes, lens)
    for i in range(16):
        a, b = rec_p[i][0], rec_f[i][0]
        assert (a.rid, a.pos, a.is_rev) == (b.rid, b.pos, b.is_rev), i
        assert b.cigar == [(L, 0)] and b.NM == 0 and b.mapq == 60
        assert a.cigar == b.cigar


def test_host_lookup_matches_device(emf_setup):
    from bwa_mem_scale_tpu.index.perfect import emf_lookup_host
    idx, pt = emf_setup
    reads = sample_reads(idx.bns, 30, 64, seed=15, err_rate=0.02)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    codes[1, 8] = 4
    lens = np.full(30, 64, dtype=np.int32)
    lens[3] = 40  # shorter than seed -> NO_TABLE
    dev = _lookup(idx, pt, codes, lens)
    host = emf_lookup_host(pt, idx.ref_string, codes, lens)
    np.testing.assert_array_equal(dev["code"], host["code"])
    hit = (host["code"] == 3) | (host["code"] == 4)
    np.testing.assert_array_equal(dev["slot"][hit], host["slot"][hit])
    np.testing.assert_array_equal(dev["loc"][hit], host["loc"][hit])


def test_multi_location_rescue_longer_than_seed():
    """A read longer than the seed whose entry's representative
    location does NOT extend-match but another list location does must
    still come back FW/RC_MATCHED with the rescued location — on both
    the device and the host probe (seedmatch_further's list scan,
    src/perfect_map.cpp:528-570)."""
    rng = np.random.RandomState(9)
    seq = rng.randint(0, 4, size=8000).astype(np.uint8)
    unit = rng.randint(0, 4, size=S).astype(np.uint8)
    p1, p2 = 1000, 5000      # seed occurs at both; context differs
    seq[p1: p1 + S] = unit
    seq[p2: p2 + S] = unit
    bns = BntSeq(l_pac=8000,
                 anns=[Annotation(name="c", anno="", offset=0,
                                  length=8000, n_ambs=0)],
                 ambs=[], seq=seq)
    idx = build_index(bns)
    pt = build_perfect_table(idx, seed_len=S)

    ext = 12
    L = S + ext
    for p_good in (p1, p2):
        read = seq[p_good: p_good + L].astype(np.int32)
        codes = read[None, :]
        lens = np.array([L], dtype=np.int32)
        out = _lookup(idx, pt, codes, lens)
        assert out["code"][0] == FW_MATCHED, p_good
        assert out["loc"][0] == p_good
        from bwa_mem_scale_tpu.index.perfect import emf_lookup_host
        host = emf_lookup_host(pt, idx.ref_string, codes, lens)
        assert host["code"][0] == out["code"][0]
        assert host["loc"][0] == out["loc"][0]
        recs = perfect_sam_records(
            MemOptions(), bns, pt, idx.ref_string,
            read.astype(np.uint8), int(out["code"][0]),
            int(out["slot"][0]), loc0=int(out["loc"][0]))
        assert recs[0].pos == p_good and recs[0].NM == 0

    # reverse-complement rescue: read is the rc of the p2 context
    read_rc = (3 - seq[p2 - ext: p2 + S][::-1]).astype(np.int32)
    codes = read_rc[None, :]
    out = _lookup(idx, pt, codes, np.array([L], np.int32))
    assert out["code"][0] == RC_MATCHED
    from bwa_mem_scale_tpu.index.perfect import emf_lookup_host
    host = emf_lookup_host(pt, idx.ref_string, codes,
                           np.array([L], np.int32))
    assert host["code"][0] == out["code"][0]
    assert host["loc"][0] == out["loc"][0]


def test_chunked_builder_matches_oneshot(small_index):
    """The genome-scale streaming builder (native emf_insert_chunk,
    position-order chunks, budget cap) must give the same lookup
    results and multi-location lists as the one-shot builder for
    every genome window."""
    import numpy as np
    from bwa_mem_scale_tpu.index.perfect import (
        build_perfect_table, build_perfect_table_chunked,
        emf_lookup_host)

    S = 40
    a = build_perfect_table(small_index, seed_len=S)
    b = build_perfect_table_chunked(small_index, seed_len=S,
                                    chunk=3000)
    assert b.max_probe >= 1
    # probe every genome window as a read (+ a few mutated misses)
    g = small_index.bns.seq
    P = len(g) - S + 1
    take = np.arange(0, P, 7)
    codes = np.stack([g[p: p + S] for p in take]).astype(np.int32)
    rng = np.random.RandomState(3)
    mut = codes[: 50].copy()
    mut[np.arange(50), rng.randint(0, S, 50)] = rng.randint(0, 4, 50)
    codes = np.concatenate([codes, mut])
    lens = np.full(len(codes), S, np.int32)
    ra = emf_lookup_host(a, small_index.ref_string, codes, lens)
    rb = emf_lookup_host(b, small_index.ref_string, codes, lens)
    assert (ra["code"] == rb["code"]).all()
    hit = (ra["code"] == 3) | (ra["code"] == 4)
    assert (ra["loc"][hit] == rb["loc"][hit]).all()
    assert (ra["n_loc"][hit] == rb["n_loc"][hit]).all()
    # multi-location lists agree seed-by-seed
    for i in np.flatnonzero(hit & (ra["n_loc"] > 1))[:200]:
        fa = a.locations(int(ra["slot"][i]))
        fb = b.locations(int(rb["slot"][i]))
        assert [list(x) for x in fa] == [list(x) for x in fb], i


def test_chunked_builder_budget_partial(small_index):
    """With a tight budget the chunked builder keeps only the
    earliest seeds: lookups either agree with the full table or miss
    (never a wrong location) — MEMSCALE partial-EMF semantics."""
    import numpy as np
    from bwa_mem_scale_tpu.index.perfect import (
        build_perfect_table, build_perfect_table_chunked,
        emf_lookup_host)

    S = 40
    full = build_perfect_table(small_index, seed_len=S)
    part = build_perfect_table_chunked(small_index, seed_len=S,
                                       chunk=5000,
                                       budget_bytes=1 << 18)
    assert len(part.loc) < len(full.loc)
    g = small_index.bns.seq
    take = np.arange(0, len(g) - S + 1, 11)
    codes = np.stack([g[p: p + S] for p in take]).astype(np.int32)
    lens = np.full(len(codes), S, np.int32)
    rf = emf_lookup_host(full, small_index.ref_string, codes, lens)
    rp = emf_lookup_host(part, small_index.ref_string, codes, lens)
    hitf = (rf["code"] == 3) | (rf["code"] == 4)
    hitp = (rp["code"] == 3) | (rp["code"] == 4)
    assert hitp.sum() < hitf.sum()      # genuinely partial
    assert hitp.sum() > 0
    ok = hitp & hitf
    assert (rp["loc"][ok] == rf["loc"][ok]).all()
    assert not (hitp & ~hitf).any()     # no spurious hits
