"""Device pipeline vs oracle pipeline: identical SAM output."""

import numpy as np
import pytest

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
