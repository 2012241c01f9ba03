"""SeStream: EMF backlog compaction + in-order emission must match
the plain per-batch path record for record."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.index.perfect import build_perfect_table
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.pipeline.stream import SeStream


def _rec_key(r):
    return (r.rid, r.pos, r.flag, r.is_rev, r.mapq, r.NM,
            tuple(r.cigar or []), r.score, r.sub, r.MD, r.XA)


def test_stream_matches_plain(small_index):
    idx = small_index
    pt = build_perfect_table(idx, seed_len=48)
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    L = 48
    n = 50
    reads = sample_reads(idx.bns, n, L, seed=4, err_rate=0.03)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(n, L, dtype=np.int32)

    plain = TpuAligner(idx, MemOptions(), cfg, emf=pt)
    want = plain.align_and_finalize(codes, lens)

    # stream in uneven chunks with a device batch smaller than the
    # input so multiple compacted batches + a ragged flush occur
    al = TpuAligner(idx, MemOptions(), cfg, emf=pt)
    stream = SeStream(al, batch_reads=16, max_len=L)
    got = {}
    off = 0
    for chunk in (7, 13, 21, 9):
        stream.feed(codes[off: off + chunk], lens[off: off + chunk],
                    off)
        off += chunk
        for rid, recs in stream.ready():
            got[rid] = recs
    stream.flush()
    for rid, recs in stream.ready():
        got[rid] = recs
    assert sorted(got) == list(range(n))
    assert al.emf_hits > 0, "no EMF hits exercised"
    n_diff = 0
    for i in range(n):
        a = [_rec_key(r) for r in want[i]]
        b = [_rec_key(r) for r in got[i]]
        if a != b:
            n_diff += 1
    assert n_diff == 0, f"{n_diff} reads differ"


def test_stream_in_order_emission(small_index):
    """ready() must never emit out of order even when later reads
    resolve (via EMF) before earlier backlogged ones."""
    idx = small_index
    pt = build_perfect_table(idx, seed_len=48)
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    reads = sample_reads(idx.bns, 12, 48, seed=6, err_rate=0.0)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    # read 0 has errors (backlogged), the rest are perfect
    codes[0, 5] = (codes[0, 5] + 1) % 4
    codes[0, 25] = (codes[0, 25] + 2) % 4
    lens = np.full(12, 48, dtype=np.int32)
    al = TpuAligner(idx, MemOptions(), cfg, emf=pt)
    stream = SeStream(al, batch_reads=64, max_len=48)
    stream.feed(codes, lens, 0)
    early = list(stream.ready())
    assert early == [], "must not emit past the pending read 0"
    stream.flush()
    order = [rid for rid, _ in stream.ready()]
    assert order == list(range(12))
