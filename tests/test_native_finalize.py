"""Native SE finalizer (native/finalize.cpp) vs the Python oracle
path: record-for-record equality on every field, including CIGAR,
NM/MD, XA, mapq, flags, and the unmapped-record case."""

import os

import numpy as np
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.pipeline import native_finalize


pytestmark = pytest.mark.skipif(not native_finalize.available(),
                                reason="native finalize lib missing")


def _records(aligner, codes, lens, disable_native):
    if disable_native:
        os.environ["BWA_TPU_NO_NATIVE_FINALIZE"] = "1"
    try:
        return aligner.align_and_finalize(codes, lens, id_offset=77)
    finally:
        os.environ.pop("BWA_TPU_NO_NATIVE_FINALIZE", None)


def _key(recs):
    return [[(a.rid, a.pos, a.flag, a.mapq, a.score, a.sub, a.NM,
              a.alt_sc, a.is_rev, a.is_alt, tuple(a.cigar or ()),
              a.MD, a.XA) for a in rr] for rr in recs]


def test_native_finalize_matches_python(small_index):
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8,
                         max_pairs=512)
    al = TpuAligner(small_index, MemOptions(), cfg)
    g = small_index.bns.seq
    rng = np.random.RandomState(11)
    B, L = 48, 100
    codes = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    for i in range(B):
        p = rng.randint(0, len(g) - L)
        s = g[p: p + L].astype(np.int32).copy()
        if i % 2:
            s[rng.rand(L) < 0.04] = rng.randint(0, 4)
        if i % 7 == 0:
            # chimeric: two distant loci -> supplementary + XA paths
            p2 = rng.randint(0, len(g) - L)
            s[L // 2:] = g[p2 + L // 2: p2 + L].astype(np.int32)
        if i % 11 == 0:
            s[:] = rng.randint(0, 4, L)   # unmappable
        codes[i] = s
    py = _records(al, codes, lens, disable_native=True)
    nat = _records(al, codes, lens, disable_native=False)
    assert _key(py) == _key(nat)
