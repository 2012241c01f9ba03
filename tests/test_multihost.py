"""Multi-host FASTQ sharding (SURVEY section 5.8): each host aligns
every Nth batch with global read ordinals preserved, so the union of
part outputs must byte-match the single-host run — the deterministic
gather contract. (The reference's analogue is N alignment processes
against one shm index store, src/bwa_shm.cpp, one SAM per process.)"""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.build import build_index
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
def mh_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    bns = make_genome(15000, seed=77)
    idx = build_index(bns)
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    return d, idx, cfg


def _run(idx, cfg, fq, paired, host_shard, batch_reads=8):
    al = TpuAligner(idx, MemOptions(), cfg)
    out = io.StringIO()
    run_alignment(al, [fq], out, batch_reads=batch_reads,
                  paired=paired, host_shard=host_shard)
    return [l for l in out.getvalue().splitlines() if l]


@pytest.mark.parametrize("paired", [False, True])
def test_shard_union_matches_single_host(mh_setup, paired):
    d, idx, cfg = mh_setup
    n = 48 if paired else 46   # non-multiple of batch for SE tail
    reads = [r[0] for r in sample_reads(idx.bns, n, L, seed=9,
                                        err_rate=0.02)]
    fq = str(d / f"mh_{paired}.fq")
    _write_fastq(fq, reads)

    full = _run(idx, cfg, fq, paired, None)
    parts = [_run(idx, cfg, fq, paired, (3, i)) for i in range(3)]

    # batch k (8 reads) belongs to host k % 3
    by_name = {}
    for lines in parts:
        for ln in lines:
            by_name.setdefault(ln.split("\t")[0], []).append(ln)
    merged = []
    for ln in full:
        name = ln.split("\t")[0]
        assert by_name.get(name), f"{name} missing from all parts"
        merged.append(by_name[name].pop(0))
    assert merged == full, "sharded records differ from single-host"
    assert not any(by_name.values()), "parts contain extra records"
    # each host really skipped the other hosts' batches
    for i, lines in enumerate(parts):
        names = {int(l.split("\t")[0][1:]) for l in lines}
        for rid in names:
            assert (rid // 8) % 3 == i


def test_host_shard_guards(mh_setup):
    d, idx, cfg = mh_setup
    al = TpuAligner(idx, MemOptions(), cfg)
    with pytest.raises(ValueError, match="chunk_bp"):
        run_alignment(al, ["x.fq"], io.StringIO(), chunk_bp=1000,
                      host_shard=(2, 0))
    with pytest.raises(ValueError, match="checkpoint"):
        run_alignment(al, ["x.fq"], io.StringIO(),
                      checkpoint_path="c.json", host_shard=(2, 0))
    with pytest.raises(ValueError, match="out of range"):
        run_alignment(al, ["x.fq"], io.StringIO(), host_shard=(2, 2))
