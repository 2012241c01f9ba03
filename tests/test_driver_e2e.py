"""Driver-level end-to-end: FASTQ files -> run_alignment -> SAM text,
SE (streamed/compacted) and PE, against the per-batch API."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.index.perfect import build_perfect_table
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.pipeline.driver import run_alignment

BASES = "ACGTN"
L = 48


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, codes in enumerate(reads):
            s = "".join(BASES[c] for c in codes)
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.fixture(scope="module")
def driver_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("drv")
    bns = make_genome(15000, seed=31)
    idx = build_index(bns)
    pt = build_perfect_table(idx, seed_len=L)
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    return d, idx, pt, cfg


def test_driver_se(driver_setup):
    d, idx, pt, cfg = driver_setup
    reads = [r[0] for r in sample_reads(idx.bns, 30, L, seed=2,
                                        err_rate=0.02)]
    fq = str(d / "se.fq")
    _write_fastq(fq, reads)
    al = TpuAligner(idx, MemOptions(), cfg, emf=pt)
    out = io.StringIO()
    n = run_alignment(al, [fq], out, batch_reads=8)
    assert n == 30
    lines = [l for l in out.getvalue().splitlines() if l]
    names = [l.split("\t")[0] for l in lines
             if not (int(l.split("\t")[1]) & 0x900)]
    assert names == [f"r{i}" for i in range(30)], "order broken"
    # concordance with the direct API
    codes = np.stack(reads).astype(np.int32)
    lens = np.full(30, L, np.int32)
    want = TpuAligner(idx, MemOptions(), cfg,
                      emf=pt).align_and_finalize(codes, lens)
    for i, l in enumerate(lines[: 30]):
        f = l.split("\t")
        w = want[i][0]
        assert int(f[3]) - 1 == w.pos and f[0] == f"r{i}", (i, l)


def test_driver_pe(driver_setup):
    d, idx, pt, cfg = driver_setup
    rng = np.random.RandomState(9)
    r1s, r2s = [], []
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    for _ in range(12):
        frag = rng.randint(L + 30, 220)
        pos = rng.randint(0, idx.bns.l_pac - frag)
        r1s.append(idx.bns.seq[pos: pos + L].copy())
        r2s.append(comp[idx.bns.seq[pos + frag - L: pos + frag][::-1]])
    f1, f2 = str(d / "p1.fq"), str(d / "p2.fq")
    _write_fastq(f1, r1s)
    _write_fastq(f2, r2s)
    al = TpuAligner(idx, MemOptions(), cfg)
    al.pes = None
    out = io.StringIO()
    n = run_alignment(al, [f1, f2], out, batch_reads=24, paired=True)
    assert n == 24
    prim = [l for l in out.getvalue().splitlines()
            if l and not (int(l.split("\t")[1]) & 0x900)]
    assert len(prim) == 24
    for l in prim:
        f = l.split("\t")
        fl = int(f[1])
        assert fl & 0x1
        assert f[6] == "="          # mate on same contig
        assert int(f[8]) != 0       # TLEN set
