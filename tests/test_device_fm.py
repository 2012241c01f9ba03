"""Device FM kernels vs the NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops.occ import (DeviceFMIndex, occ_all4,
                                       backward_ext_all4, bwt_base_at)
from bwa_mem_scale_tpu.ops.smem import collect_smems_device
from bwa_mem_scale_tpu.ref.fm import FMOracle, Smem

from conftest import sample_reads


@pytest.fixture(scope="module")
def dev_index(small_index):
    return DeviceFMIndex.from_host(small_index)


def test_occ_device(small_index, dev_index):
    fm = FMOracle(small_index)
    rng = np.random.RandomState(0)
    pos = rng.randint(0, small_index.seq_len, size=256)
    got = np.asarray(occ_all4(dev_index, jnp.asarray(pos)))
    for i, p in enumerate(pos):
        for c in range(4):
            assert got[i, c] == fm.occ(int(p), c)


def test_backward_ext_device(small_index, dev_index):
    fm = FMOracle(small_index)
    rng = np.random.RandomState(1)
    n = small_index.seq_len
    ks = rng.randint(0, n - 100, size=64)
    ss = rng.randint(1, 100, size=64)
    ls = rng.randint(0, n, size=64)
    k4, l4, s4 = backward_ext_all4(dev_index, jnp.asarray(ks),
                                   jnp.asarray(ls), jnp.asarray(ss))
    k4, l4, s4 = map(np.asarray, (k4, l4, s4))
    for i in range(len(ks)):
        for a in range(4):
            sm = fm.backward_ext(
                Smem(0, 0, 0, int(ks[i]), int(ls[i]), int(ss[i])), a)
            assert (k4[i, a], l4[i, a], s4[i, a]) == (sm.k, sm.l, sm.s)


def test_bwt_base_at(small_index, dev_index):
    fm = FMOracle(small_index)
    rng = np.random.RandomState(2)
    pos = rng.randint(0, small_index.seq_len, size=256)
    got = np.asarray(bwt_base_at(dev_index, jnp.asarray(pos)))
    for i, p in enumerate(pos):
        assert got[i] == fm.bwt_base_at(int(p))


def _oracle_collect(fm, opt, codes):
    return fm.collect_smems(codes, 0, opt)


def test_collect_smems_device_matches_oracle(small_index, dev_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    reads = sample_reads(small_index.bns, 16, 101, seed=5, err_rate=0.03)
    # include a read with Ns
    codes_list = [c for c, _, _ in reads]
    withn = codes_list[0].copy()
    withn[10] = 4
    withn[50] = 4
    codes_list.append(withn)

    B = len(codes_list)
    L = max(len(c) for c in codes_list)
    codes = np.full((B, L), 4, dtype=np.int32)
    for i, c in enumerate(codes_list):
        codes[i, : len(c)] = c
    lens = np.array([len(c) for c in codes_list], dtype=np.int32)

    bufs = collect_smems_device(
        dev_index, jnp.asarray(codes), jnp.asarray(lens),
        min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv)
    m, n, k, l, s, cnt = map(np.asarray, bufs)

    for i, c in enumerate(codes_list):
        want = _oracle_collect(fm, opt, c)
        got = [(int(m[i, j]), int(n[i, j]), int(k[i, j]), int(l[i, j]),
                int(s[i, j])) for j in range(int(cnt[i]))]
        wanted = [(sm.m, sm.n, sm.k, sm.l, sm.s) for sm in want]
        assert got == wanted, f"read {i}: {got} != {wanted}"
