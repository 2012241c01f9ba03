"""FMA (smem-table accelerator) — fast-forwarded SMEM search must be
bit-identical to the plain search (reference behavior contract:
src/FMI_search.cpp:1414-1463 consume the table with no output change).
"""

import numpy as np
import pytest

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.smem import collect_smems_device
from bwa_mem_scale_tpu.ops.fma import (build_fma_table, save_fma,
                                       load_fma)


def _batch(bns, n, L, seed, err):
    reads = sample_reads(bns, n, L, seed=seed, err_rate=err)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    # sprinkle Ns
    rng = np.random.RandomState(seed + 1)
    nmask = rng.rand(*codes.shape) < 0.01
    codes[nmask] = 4
    lens = np.full(n, L, dtype=np.int32)
    lens[:: 7] = L - rng.randint(0, 9)
    return codes, lens


def _smem_np(buf):
    return {f: np.asarray(getattr(buf, f))
            for f in ("m", "n", "k", "l", "s", "cnt")}


@pytest.mark.parametrize("min_seed_len,max_mem_intv", [(10, 20), (3, 4)])
def test_fma_identical_smems(small_index, min_seed_len, max_mem_intv,
                             tmp_path):
    fmi = DeviceFMIndex.from_host(small_index)
    fma_host = build_fma_table(fmi, K=5, chunk=512)
    # round-trip through the artifact file
    path = save_fma(fma_host, str(tmp_path / "idx"))
    fma = load_fma(path).to_device(fmi.pos_dtype)

    codes, lens = _batch(small_index.bns, 24, 48, seed=3, err=0.05)
    kw = dict(min_seed_len=min_seed_len, split_len=int(min_seed_len * 1.5),
              split_width=10, max_mem_intv=max_mem_intv, max_out=48)
    base = _smem_np(collect_smems_device(fmi, codes, lens, **kw))
    fast = _smem_np(collect_smems_device(fmi, codes, lens, fma=fma, **kw))

    np.testing.assert_array_equal(base["cnt"], fast["cnt"])
    for b in range(codes.shape[0]):
        c = int(base["cnt"][b])
        for f in ("m", "n", "k", "l", "s"):
            np.testing.assert_array_equal(base[f][b, :c], fast[f][b, :c],
                                          err_msg=f"read {b} field {f}")
    assert base["cnt"].sum() > 0
