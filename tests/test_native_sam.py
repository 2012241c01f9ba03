"""Native SAM text composition (compose_sam_se) vs the Python writer.

The sam-mode stream must produce byte-identical lines to running the
Aln-record stream through io.sam.aln_to_sam_line — including the EMF
perfect-hit fast path, supplementary/SA records, XA tags, secondary
SEQ suppression, and unmapped reads.
"""

import numpy as np
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.pipeline import native_finalize
from bwa_mem_scale_tpu.pipeline.stream import SeStream
from bwa_mem_scale_tpu.io.sam import compose_sam_python

pytestmark = pytest.mark.skipif(not native_finalize.available(),
                                reason="native finalize lib missing")


def _mk_batch(small_index, B, L, seed):
    g = small_index.bns.seq
    rng = np.random.RandomState(seed)
    codes = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    for i in range(B):
        p = rng.randint(0, len(g) - L)
        s = g[p: p + L].astype(np.int32).copy()
        if i % 3 == 1:
            s[rng.rand(L) < 0.04] = rng.randint(0, 4)
        if i % 7 == 0:
            p2 = rng.randint(0, len(g) - L)
            s[L // 2:] = g[p2 + L // 2: p2 + L].astype(np.int32)
        if i % 11 == 0:
            s[:] = rng.randint(0, 4, L)   # unmappable
        if i % 5 == 2:
            # reverse strand + exact (EMF fast-path candidates)
            s = (3 - g[p: p + L].astype(np.int32))[::-1].copy()
        codes[i] = s
    return codes, lens


def _run_stream(al, codes, lens, B, L, sam):
    st = SeStream(al, B, L, sam=sam)
    names = [b"q%d" % i for i in range(codes.shape[0])]
    quals = [bytes([33 + (i % 40)] * L) for i in range(codes.shape[0])]
    st.feed(codes, lens, 0, names=names, quals=quals)
    st.flush()
    return dict(st.ready()), names, quals


def _with_emf(small_index, L):
    from bwa_mem_scale_tpu.index.perfect import build_perfect_table
    return build_perfect_table(small_index, seed_len=L)


@pytest.mark.parametrize("use_emf", [False, True])
def test_sam_mode_matches_python_writer(small_index, use_emf):
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8,
                         max_pairs=512)
    opt = MemOptions()
    B, L = 32, 100
    emf = _with_emf(small_index, L) if use_emf else None
    al = TpuAligner(small_index, opt, cfg, emf=emf)
    codes, lens = _mk_batch(small_index, B, L, seed=5)

    got, names, quals = _run_stream(al, codes, lens, B, L, sam=True)
    assert all(isinstance(v, bytes) for v in got.values())

    al2 = TpuAligner(small_index, opt, cfg, emf=emf)
    recs, _, _ = _run_stream(al2, codes, lens, B, L, sam=False)

    sam_ctx = dict(names=names, quals=quals, rg_id=None)
    for rid in range(B):
        want = compose_sam_python(opt, small_index.bns,
                                  codes[rid, : lens[rid]], recs[rid],
                                  sam_ctx, rid)
        assert got[rid] == want, (
            f"read {rid}:\n native: {got[rid]!r}\n python: {want!r}")
