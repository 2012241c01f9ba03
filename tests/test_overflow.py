"""Capacity-overflow retry: no alignment is ever dropped.

The reference grows heap-backed vectors and never loses seeds/regions
(src/bwamem.cpp:789-1050). The fixed-shape device pipeline instead
flags reads whose chain/coord/reg/pair budget truncated work
(seed_chain_extend's read_overflow) and re-runs them at a larger shape
(TpuAligner._apply_overflow_retry). This test makes every budget fire
on a repeat-dense genome and asserts the final SAM equals a
roomy-capacity run.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.bntseq import BntSeq, Annotation
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
from bwa_mem_scale_tpu.io.fastq import Read, ReadBatch


@pytest.fixture(scope="module")
def repeat_index():
    """A genome where a 200 bp unit recurs ~40 times: reads from the
    unit hit dozens of locations and blow small seed/coord budgets."""
    rng = np.random.RandomState(7)
    unit = rng.randint(0, 4, size=200).astype(np.uint8)
    parts = []
    for i in range(40):
        parts.append(unit)
        parts.append(rng.randint(0, 4, size=150).astype(np.uint8))
    seq = np.concatenate(parts)
    bns = BntSeq(l_pac=len(seq),
                 anns=[Annotation(name="rep", anno="(null)", offset=0,
                                  length=len(seq), n_ambs=0)],
                 ambs=[], seq=seq)
    return build_index(bns)


def _reads(idx, n=12, L=120, seed=3):
    rng = np.random.RandomState(seed)
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    reads = []
    for i in range(n):
        # bias starts into the repeat units (each unit starts at
        # multiples of 350)
        u = rng.randint(0, 38)
        off = rng.randint(0, 120)
        pos = u * 350 + off
        frag = idx.bns.seq[pos: pos + L].copy()
        if rng.randint(2):
            frag = comp[frag[::-1]]
        reads.append(Read(name=f"r{i}", seq=frag.astype(np.uint8),
                          qual="I" * L))
    return ReadBatch(reads)


def test_overflow_fires_and_output_is_lossless(repeat_index):
    opt = MemOptions()
    batch = _reads(repeat_index)

    tiny = TpuAligner(repeat_index, opt, PipelineConfig(
        max_coords=16, max_chains=4, max_seeds_per_chain=4,
        max_regs=4, max_pairs=16))
    roomy = TpuAligner(repeat_index, opt, PipelineConfig(
        max_coords=2048, max_chains=128, max_seeds_per_chain=64,
        max_regs=256, max_pairs=12 * 256))

    got = tiny.align_reads_to_sam(batch)
    want = roomy.align_reads_to_sam(batch)

    # the budgets must actually have fired (else the test is vacuous)
    assert getattr(tiny, "overflow_retried", 0) > 0
    assert getattr(roomy, "overflow_retried", 0) == 0
    assert got == want


def test_overflow_flag_visible_in_out_dict(repeat_index):
    """Grep-able consumer contract: read_overflow is exposed per read
    and true for budget-blown reads."""
    import jax.numpy as jnp
    from bwa_mem_scale_tpu.pipeline.align import seed_chain_extend

    opt = MemOptions()
    tiny_cfg = PipelineConfig(max_coords=16, max_chains=4,
                              max_seeds_per_chain=4, max_regs=4,
                              max_pairs=16)
    al = TpuAligner(repeat_index, opt, tiny_cfg)
    batch = _reads(repeat_index)
    codes, lens = batch.padded_codes()
    out = seed_chain_extend(
        al.fmi, al.dbns, jnp.asarray(codes, jnp.int32),
        jnp.asarray(lens, jnp.int32), L=int(codes.shape[1]),
        opt=opt, cfg=tiny_cfg)
    of = np.asarray(out["read_overflow"])
    assert of.shape == (len(batch.reads),)
    assert of.any()
    meta = np.asarray(out["meta"])
    np.testing.assert_array_equal(meta[:, 1] > 0.5, of)


def test_overflow_deferred_retry_sam_stream(repeat_index):
    """sam-mode stream defers overflow reads to the retry backlog
    (amortized tier batches); final SAM bytes must equal a roomy
    no-overflow run's."""
    from bwa_mem_scale_tpu.pipeline.stream import SeStream
    from bwa_mem_scale_tpu.pipeline import native_finalize
    if not native_finalize.available():
        pytest.skip("native finalize lib missing")
    opt = MemOptions()
    batch = _reads(repeat_index, n=16)
    codes, lens = batch.padded_codes()
    codes = codes.astype(np.int32)
    names = [r.name.encode() for r in batch.reads]
    quals = [r.qual.encode() for r in batch.reads]

    def run(cfg):
        al = TpuAligner(repeat_index, opt, cfg)
        st = SeStream(al, 8, codes.shape[1], sam=True)
        st.retry_batch = 4       # force multiple drains
        st.feed(codes, lens, 0, names=names, quals=quals)
        st.flush()
        got = dict(st.ready())
        assert len(got) == len(batch.reads)
        return [got[i] for i in range(len(batch.reads))], al

    got, tiny = run(PipelineConfig(
        max_coords=16, max_chains=4, max_seeds_per_chain=4,
        max_regs=4, max_pairs=16))
    want, roomy = run(PipelineConfig(
        max_coords=2048, max_chains=128, max_seeds_per_chain=64,
        max_regs=256, max_pairs=12 * 256))
    assert getattr(tiny, "overflow_retried", 0) > 0
    assert getattr(roomy, "overflow_retried", 0) == 0
    assert got == want
