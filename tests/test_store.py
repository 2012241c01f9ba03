"""Index store + MEMSCALE budget policy (reference: src/bwa_shm.cpp)."""

import os

import numpy as np
import pytest

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu import store
from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.artifacts import save_index, load_index
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.index.perfect import (build_perfect_table,
                                             save_perfect_table)
from bwa_mem_scale_tpu.ops.fma import build_fma_table, save_fma
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    d = tmp_path_factory.mktemp("idx")
    prefix = str(d / "g")
    bns = make_genome(20000, seed=8)
    idx = build_index(bns)
    save_index(idx, prefix)
    save_fma(build_fma_table(DeviceFMIndex.from_host(idx), K=4,
                             chunk=256), prefix)
    save_perfect_table(build_perfect_table(idx, seed_len=40), prefix)
    return prefix, idx, str(d / "store")


def test_budget_policy(staged):
    prefix, idx, sdir = staged
    sizes = {k: os.stat(v).st_size
             for k, v in store.discover_artifacts(prefix).items()}
    # unlimited: everything
    assert set(store.plan_budget(prefix, None)) == {"index", "fma",
                                                    "emf"}
    # just the index
    gb = (sizes["index"] + 10) / (1 << 30)
    assert store.plan_budget(prefix, gb) == ["index"]
    # index + fma but not emf
    gb = (sizes["index"] + sizes["fma"] + 10) / (1 << 30)
    assert set(store.plan_budget(prefix, gb)) == {"index", "fma"}
    # below the mandatory index -> error
    with pytest.raises(ValueError):
        store.plan_budget(prefix, sizes["index"] / 4 / (1 << 30))


def test_stage_attach_roundtrip(staged):
    prefix, idx, sdir = staged
    store.stage(prefix, None, store_dir=sdir, log=lambda m: None)
    att = store.attach(prefix, store_dir=sdir)
    assert att is not None and att.has("fma") and att.has("emf")
    idx2 = store.index_from_store(att.pieces["index"])
    np.testing.assert_array_equal(idx2.cp_mask, idx.cp_mask)
    np.testing.assert_array_equal(idx2.sa_samples, idx.sa_samples)
    assert idx2.bns.l_pac == idx.bns.l_pac
    assert idx2.bns.anns[0].name == idx.bns.anns[0].name
    fma = store.fma_from_store(att.pieces["fma"])
    assert fma.K == 4 and fma.ladder_s.shape[0] == 4 ** 4
    emf = store.emf_from_store(att.pieces["emf"])
    assert emf.seed_len == 40

    # aligner built from the store gives the same regions
    from bwa_mem_scale_tpu.pipeline.align import (TpuAligner,
                                                  PipelineConfig)
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    reads = sample_reads(idx.bns, 8, 40, seed=2, err_rate=0.02)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(8, 40, dtype=np.int32)
    a1 = TpuAligner(idx, MemOptions(), cfg)
    a2 = TpuAligner(idx2, MemOptions(), cfg, fma=fma, emf=emf)
    r1 = a1.align_batch(codes, lens)
    r2 = a2.align_batch(codes, lens)
    for x, y in zip(r1, r2):
        assert [(r.rb, r.re, r.score) for r in x] == \
            [(r.rb, r.re, r.score) for r in y]


def test_stale_store_rejected(staged):
    prefix, idx, sdir = staged
    store.stage(prefix, None, store_dir=sdir, log=lambda m: None)
    # touch the source artifact -> identity mismatch -> no attach
    os.utime(prefix + ".tpuidx.npz")
    assert store.attach(prefix, store_dir=sdir) is None
    assert store.remove(prefix, store_dir=sdir)
    assert store.attach(prefix, store_dir=sdir) is None
