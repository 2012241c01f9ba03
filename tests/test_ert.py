"""ERT seeding — the suffix-trie walker must reproduce the FM-index
seeder bit for bit (m, n, k, s; l is not represented in the trie)."""

import numpy as np
import pytest

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.index.build import build_index, suffix_array
from bwa_mem_scale_tpu.index.ert import (build_ert, save_ert, load_ert,
                                         DEFAULT_MAX_DEPTH)
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.smem import collect_smems_device
from bwa_mem_scale_tpu.ops.ert import DeviceErt, collect_smems_ert


@pytest.fixture(scope="module")
def ert_setup(tmp_path_factory):
    bns = make_genome(20000, seed=42)
    idx = build_index(bns, sa_compx=0)   # full SA resident (ERT mode)
    sa = idx.sa_samples
    ert = build_ert(idx.ref_string, sa, K=6, max_depth=80)
    path = save_ert(ert, str(tmp_path_factory.mktemp("ert") / "g"))
    ert = load_ert(path)
    fmi = DeviceFMIndex.from_host(idx)
    dert = DeviceErt.from_host(ert, sa, idx.count)
    return idx, fmi, dert


def _cmp(a, b, fields=("m", "n", "k", "s")):
    an = {f: np.asarray(getattr(a, f)) for f in fields + ("cnt",)}
    bn = {f: np.asarray(getattr(b, f)) for f in fields + ("cnt",)}
    np.testing.assert_array_equal(an["cnt"], bn["cnt"])
    B = an["m"].shape[0]
    for i in range(B):
        c = int(an["cnt"][i])
        for f in fields:
            np.testing.assert_array_equal(
                an[f][i, :c], bn[f][i, :c],
                err_msg=f"read {i} field {f}")


@pytest.mark.parametrize("min_seed_len,max_mem_intv", [(10, 20), (3, 4)])
def test_ert_matches_fm(ert_setup, min_seed_len, max_mem_intv):
    idx, fmi, dert = ert_setup
    reads = sample_reads(idx.bns, 24, 48, seed=3, err_rate=0.05)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    rng = np.random.RandomState(5)
    nmask = rng.rand(*codes.shape) < 0.01
    codes[nmask] = 4
    lens = np.full(24, 48, dtype=np.int32)
    lens[::5] = 48 - rng.randint(0, 9)

    kw = dict(min_seed_len=min_seed_len,
              split_len=int(min_seed_len * 1.5), split_width=10,
              max_mem_intv=max_mem_intv, max_out=48)
    fm_out = collect_smems_device(fmi, codes, lens, **kw)
    ert_out = collect_smems_ert(dert, fmi.ref, codes, lens,
                                pos_dtype=fmi.pos_dtype, **kw)
    _cmp(fm_out, ert_out)
    assert np.asarray(fm_out.cnt).sum() > 0


def test_ert_depth_cap(ert_setup):
    """Matches stop at the trie depth cap: E must not extend past it
    for multi-hit paths (single-hit paths verify lazily, uncapped)."""
    idx, fmi, dert = ert_setup
    # a read copied straight from the genome: one long unique match
    read = idx.ref_string[500:600].astype(np.int32)[None, :]
    lens = np.array([100], dtype=np.int32)
    kw = dict(min_seed_len=10, split_len=15, split_width=10,
              max_mem_intv=0, max_out=100)
    fm_out = collect_smems_device(fmi, read, lens, **kw)
    ert_out = collect_smems_ert(dert, fmi.ref, read, lens,
                                pos_dtype=fmi.pos_dtype, **kw)
    _cmp(fm_out, ert_out)
