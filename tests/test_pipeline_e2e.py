"""Device pipeline vs oracle pipeline: identical SAM output."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ref.fm import FMOracle
from bwa_mem_scale_tpu.ref.pipeline import align_batch_to_sam
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.io.fastq import Read, ReadBatch

from conftest import sample_reads


@pytest.fixture(scope="module")
def aligner(small_index):
    return TpuAligner(small_index, MemOptions(),
                      PipelineConfig(max_coords=256, max_chains=32,
                                     max_seeds_per_chain=16, max_regs=32))


def _batch(raw):
    return ReadBatch([Read(name=f"r{i}", seq=c, qual="I" * len(c))
                      for i, (c, _, _) in enumerate(raw)])


def test_device_pipeline_matches_oracle_sam(small_index, aligner):
    fm = FMOracle(small_index)
    opt = MemOptions()
    raw = sample_reads(small_index.bns, 24, 120, seed=21, err_rate=0.02)
    batch = _batch(raw)
    want = align_batch_to_sam(fm, opt, batch)
    got = aligner.align_reads_to_sam(batch)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w


def test_device_pipeline_noisier(small_index, aligner):
    fm = FMOracle(small_index)
    opt = MemOptions()
    raw = sample_reads(small_index.bns, 16, 120, seed=22, err_rate=0.05,
                       indel_rate=0.0)
    batch = _batch(raw)
    want = align_batch_to_sam(fm, opt, batch)
    got = aligner.align_reads_to_sam(batch)
    assert got == want


def test_device_pipeline_maps_correctly(small_index, aligner):
    raw = sample_reads(small_index.bns, 32, 120, seed=23, err_rate=0.02)
    batch = _batch(raw)
    lines = aligner.align_reads_to_sam(batch)
    prim = {}
    for ln in lines:
        cols = ln.split("\t")
        flag = int(cols[1])
        if not (flag & 0x900):
            prim[cols[0]] = (int(cols[3]) - 1, bool(flag & 0x10))
    ok = 0
    for i, (codes, pos, is_rev) in enumerate(raw):
        got = prim.get(f"r{i}")
        if got and abs(got[0] - pos) < 5 and got[1] == is_rev:
            ok += 1
    assert ok >= 30


def test_alt_contig_flag_and_ignore(small_genome):
    """Regions on a .alt contig carry is_alt (feeding mark_primary's
    ALT logic and XA grouping); clearing the annotations — what the
    CLI's -j does before building the aligner — removes it."""
    import numpy as np
    from bwa_mem_scale_tpu.config import MemOptions
    from bwa_mem_scale_tpu.index.bntseq import BntSeq, Annotation
    from bwa_mem_scale_tpu.index.build import build_index
    from bwa_mem_scale_tpu.pipeline.align import TpuAligner

    seq = small_genome.seq[:12000].copy()
    anns = [Annotation(name="chr", anno="", offset=0, length=9000,
                       n_ambs=0),
            Annotation(name="alt1", anno="", offset=9000, length=3000,
                       n_ambs=0, is_alt=True)]
    bns = BntSeq(l_pac=12000, anns=anns, ambs=[], seq=seq)
    idx = build_index(bns)

    read = seq[10000:10100].astype(np.int32)  # inside the ALT contig
    codes = read[None, :]
    lens = np.array([100], np.int32)

    al = TpuAligner(idx, MemOptions())
    regs = al.align_batch(codes, lens)[0]
    assert regs and all(r.is_alt for r in regs if r.rid == 1)
    assert any(r.rid == 1 for r in regs)

    for a in idx.bns.anns:      # the CLI's -j path
        a.is_alt = False
    al2 = TpuAligner(idx, MemOptions())
    regs2 = al2.align_batch(codes, lens)[0]
    assert regs2 and not any(r.is_alt for r in regs2)
