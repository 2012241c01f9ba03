"""Paired-end: insert-size estimation, pairing, mate rescue, and PE
SAM record composition (reference: src/bwamem_pair.cpp)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_genome

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.pipeline.pe import mem_infer_dir, mem_pestat
from bwa_mem_scale_tpu.ref.ksw import cigar_rlen

L = 100


def sim_pairs(bns, n_pairs, mean=300, std=20, err=0.0, seed=0):
    """FR pairs: read1 = fragment start (fw), read2 = fragment end
    (rc). Returns interleaved codes [2N, L], lens, truth list."""
    rng = np.random.RandomState(seed)
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    codes = np.full((2 * n_pairs, L), 4, dtype=np.int32)
    truth = []
    for p in range(n_pairs):
        frag = max(int(rng.normal(mean, std)), L + 10)
        pos = rng.randint(0, bns.l_pac - frag)
        r1 = bns.seq[pos: pos + L].copy()
        r2 = comp[bns.seq[pos + frag - L: pos + frag][::-1]].copy()
        for r in (r1, r2):
            if err > 0:
                m = rng.rand(L) < err
                r[m] = (r[m] + rng.randint(1, 4, m.sum())) % 4
        codes[2 * p] = r1
        codes[2 * p + 1] = r2
        truth.append((pos, pos + frag - L, frag))
    lens = np.full(2 * n_pairs, L, dtype=np.int32)
    return codes, lens, truth


@pytest.fixture(scope="module")
def pe_setup():
    bns = make_genome(60000, seed=21)
    idx = build_index(bns)
    cfg = PipelineConfig(max_coords=64, max_chains=16,
                         max_seeds_per_chain=8, max_regs=16)
    return idx, TpuAligner(idx, MemOptions(), cfg)


def test_pe_end_to_end(pe_setup):
    idx, aligner = pe_setup
    codes, lens, truth = sim_pairs(idx.bns, 24, err=0.01, seed=3)
    records, mates = aligner.align_pairs_and_finalize(codes, lens)
    n_proper = 0
    for p, (pos1, pos2, frag) in enumerate(truth):
        a = records[2 * p][0]
        b = records[2 * p + 1][0]
        assert a.flag & 0x40 and b.flag & 0x80
        assert a.flag & 0x1 and b.flag & 0x1
        assert a.pos == pos1 and b.pos == pos2, p
        assert (not a.is_rev) and b.is_rev, p
        if a.flag & 0x2:
            n_proper += 1
        # mate record consistency
        assert mates[2 * p].pos == b.pos
        assert mates[2 * p + 1].pos == a.pos
    assert n_proper >= 22  # nearly all proper pairs


def test_pestat_distribution(pe_setup):
    idx, aligner = pe_setup
    codes, lens, truth = sim_pairs(idx.bns, 32, mean=350, std=25,
                                   seed=7)
    all_regs = aligner.align_batch(codes, lens)
    from bwa_mem_scale_tpu.ref.finalize import sort_dedup_patch
    opt = aligner.opt
    for i in range(len(all_regs)):
        q = codes[i, : lens[i]].astype(np.uint8)
        all_regs[i] = sort_dedup_patch(opt, idx.bns, idx.ref_string, q,
                                       all_regs[i])
    pair_regs = [(all_regs[2 * p], all_regs[2 * p + 1])
                 for p in range(32)]
    pes = mem_pestat(opt, idx.bns.l_pac, pair_regs)
    assert not pes[1].failed          # FR
    assert pes[0].failed and pes[2].failed and pes[3].failed
    assert abs(pes[1].avg - 350) < 30
    assert pes[1].low <= 300 <= pes[1].high


def test_mate_rescue(pe_setup):
    """A mate with an error every 10 bp has no exact 19-mer seed and
    must be recovered by the windowed SW rescue."""
    idx, aligner = pe_setup
    codes, lens, truth = sim_pairs(idx.bns, 24, seed=11)
    victim = 5
    vrow = 2 * victim + 1
    # errors every 10 bp, away from the ends so the local rescue
    # alignment strictly gains by spanning each of them
    for j in range(5, L - 10, 10):
        codes[vrow, j] = (codes[vrow, j] + 1 + (j // 10) % 3) % 4
    # sanity: victim read alone yields no regions
    solo = aligner.align_batch(codes[vrow: vrow + 1],
                               lens[vrow: vrow + 1])
    assert len(solo[0]) == 0
    records, mates = aligner.align_pairs_and_finalize(codes, lens)
    b = records[vrow][0]
    pos1, pos2, frag = truth[victim]
    assert b.rid >= 0, "mate not rescued"
    assert b.pos == pos2
    assert b.is_rev
    assert b.flag & 0x2, "rescued pair not proper"
    assert cigar_rlen(b.cigar) == L
    assert b.NM == 9


def test_infer_dir():
    l_pac = 1000
    # same strand, b2 after b1 -> FF (0)
    assert mem_infer_dir(l_pac, 100, 300) == (0, 200)
    # read2 on reverse strand after read1 -> FR (1)
    d, dist = mem_infer_dir(l_pac, 100, 2 * l_pac - 1 - 400)
    assert d == 1 and dist == 300
