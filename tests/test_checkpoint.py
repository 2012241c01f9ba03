"""Stream-offset checkpoint/resume: a resumed run must reproduce the
uninterrupted run's remaining records byte-for-byte (ids are global
input ordinals, so hash tiebreaks match)."""

import pytest

pytestmark = pytest.mark.slow

import io
import json
import os

import numpy as np

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.pipeline.align import TpuAligner
from bwa_mem_scale_tpu.pipeline.driver import run_alignment


def _fixture(small_index, tmp_path, n=24):
    bases = "ACGT"
    rng = np.random.RandomState(3)
    g = small_index.bns.seq
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(n):
            p = rng.randint(0, len(g) - 100)
            s = g[p: p + 100].astype(np.uint8).copy()
            s[rng.rand(100) < 0.01] = rng.randint(0, 4)
            txt = "".join(bases[c] for c in s)
            f.write(f"@r{i}\n{txt}\n+\n{'I' * 100}\n")
    return str(fq)


def test_resume_matches_full_run(small_index, tmp_path):
    fq = _fixture(small_index, tmp_path)
    aligner = TpuAligner(small_index, MemOptions())

    ck = str(tmp_path / "run.ckpt")
    full = io.StringIO()
    n = run_alignment(aligner, [fq], full, batch_reads=8,
                      checkpoint_path=ck)
    assert n == 24
    with open(ck) as f:
        state = json.load(f)
    assert state["reads_emitted"] == 24
    full_lines = full.getvalue().splitlines()

    # resume after 8 reads: the remaining records must be identical
    part = io.StringIO()
    n2 = run_alignment(aligner, [fq], part, batch_reads=8,
                       skip_reads=8, checkpoint_path=ck)
    assert n2 == 16
    part_lines = part.getvalue().splitlines()
    names_done = {f"r{i}" for i in range(8)}
    expect = [ln for ln in full_lines
              if ln.split("\t")[0] not in names_done]
    assert part_lines == expect
    with open(ck) as f:
        assert json.load(f)["reads_emitted"] == 24
