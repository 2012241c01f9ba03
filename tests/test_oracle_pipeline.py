"""End-to-end oracle pipeline: simulated reads must map back home."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ref.fm import FMOracle
from bwa_mem_scale_tpu.ref.pipeline import align_read, align_batch_to_sam
from bwa_mem_scale_tpu.ref.finalize import reg2sam_records
from bwa_mem_scale_tpu.io.fastq import Read, ReadBatch
from bwa_mem_scale_tpu.ref.ksw import cigar_qlen, cigar_string

from conftest import sample_reads


def test_align_perfect_reads(small_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    reads = sample_reads(small_index.bns, 20, 100, seed=7)
    for i, (codes, pos, is_rev) in enumerate(reads):
        regs = align_read(fm, opt, codes, i)
        assert regs, f"read {i} unaligned"
        best = regs[0]
        assert best.score == 100  # perfect match, full-length
        records = reg2sam_records(opt, small_index.bns,
                                  small_index.ref_string, codes, regs)
        prim = records[0]
        assert prim.rid == 0
        assert prim.pos == pos
        assert prim.is_rev == is_rev
        assert prim.cigar == [(100, 0)]
        assert prim.NM == 0
        assert prim.mapq > 0


def test_align_noisy_reads(small_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    reads = sample_reads(small_index.bns, 20, 150, seed=8, err_rate=0.02)
    n_correct = 0
    for i, (codes, pos, is_rev) in enumerate(reads):
        regs = align_read(fm, opt, codes, i)
        if not regs:
            continue
        records = reg2sam_records(opt, small_index.bns,
                                  small_index.ref_string, codes, regs)
        prim = records[0]
        if prim.rid == 0 and abs(prim.pos - pos) < 10 and prim.is_rev == is_rev:
            n_correct += 1
        # CIGAR query length must equal the read length.
        if prim.cigar:
            assert cigar_qlen(prim.cigar) == len(codes), \
                cigar_string(prim.cigar)
    assert n_correct >= 18


def test_sam_output_shape(small_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    raw = sample_reads(small_index.bns, 5, 100, seed=9, err_rate=0.01)
    batch = ReadBatch([Read(name=f"r{i}", seq=c, qual="I" * len(c))
                       for i, (c, _, _) in enumerate(raw)])
    lines = align_batch_to_sam(fm, opt, batch)
    assert len(lines) >= 5
    for ln in lines:
        cols = ln.rstrip("\n").split("\t")
        assert len(cols) >= 11
        flag = int(cols[1])
        assert 0 <= flag < 0x10000
        assert cols[9] != "*" or (flag & 0x100)
