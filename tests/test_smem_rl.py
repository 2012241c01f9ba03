"""Read-per-lane SMEM machine vs the NumPy oracle and the
position-parallel sweep (ops/smem.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.smem import SmemBuf, collect_smems_device
from bwa_mem_scale_tpu.ops.smem_rl import (collect_smems_rl,
                                           one_pos_machine,
                                           seed_strategy_machine)
from bwa_mem_scale_tpu.ref.fm import FMOracle

from conftest import sample_reads


@pytest.fixture(scope="module")
def dev_index(small_index):
    return DeviceFMIndex.from_host(small_index)


def _read_set(small_index):
    reads = sample_reads(small_index.bns, 16, 101, seed=5,
                         err_rate=0.03)
    codes_list = [c.astype(np.int32) for c, _, _ in reads]
    withn = codes_list[0].copy()
    withn[10] = 4
    withn[50] = 4
    codes_list.append(withn)
    # repetitive read (tiled 30-mer) to force reseed tasks
    rep = np.tile(small_index.bns.seq[100:130].astype(np.int32),
                  4)[:101]
    codes_list.append(rep)
    codes_list.append(codes_list[1][:40].copy())  # short read
    B = len(codes_list)
    L = 101
    codes = np.full((B, L), 4, dtype=np.int32)
    for i, c in enumerate(codes_list):
        codes[i, : len(c)] = c
    lens = np.array([len(c) for c in codes_list], dtype=np.int32)
    return codes_list, codes, lens


def test_collect_smems_rl_matches_oracle(small_index, dev_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    codes_list, codes, lens = _read_set(small_index)
    bufs = collect_smems_rl(
        dev_index, jnp.asarray(codes), jnp.asarray(lens),
        min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv)
    m, n, k, l, s, cnt = map(np.asarray, bufs)
    for i, c in enumerate(codes_list):
        want = [(sm.m, sm.n, sm.k, sm.l, sm.s)
                for sm in fm.collect_smems(c, 0, opt)]
        got = [(int(m[i, j]), int(n[i, j]), int(k[i, j]),
                int(l[i, j]), int(s[i, j]))
               for j in range(int(cnt[i]))]
        assert got == want, f"read {i}: {got} != {want}"


def test_one_pos_machine_matches_oracle_per_position(small_index,
                                                     dev_index):
    """Single-position walks (reseed building block) at several x,
    including mid-read and near-end starts."""
    fm = FMOracle(small_index)
    codes_list, codes, lens = _read_set(small_index)
    q = codes_list[0]
    L = codes.shape[1]
    codes1 = jnp.asarray(q[None, :])
    lens1 = jnp.asarray(np.array([len(q)], np.int32))
    for x in (0, 1, 17, 50, 63, 99, 100):
        want_l = []
        fm.smems_one_pos(q.astype(int), x, 0, 1, 19, want_l)
        want = sorted((sm.m, sm.n, sm.k, sm.l, sm.s) for sm in want_l)
        buf = one_pos_machine(
            dev_index, codes1, lens1, jnp.zeros((1,), jnp.int32),
            jnp.asarray(np.array([x], np.int32)),
            jnp.ones((1,), jnp.int32), jnp.ones((1,), bool),
            False, 19, L, SmemBuf.empty(1, L, dev_index.pos_dtype))
        m, n, k, l, s, c = map(np.asarray, buf)
        got = sorted((int(m[0, j]), int(n[0, j]), int(k[0, j]),
                      int(l[0, j]), int(s[0, j]))
                     for j in range(int(c[0])))
        assert got == want, f"x={x}: {got} != {want}"


def test_seed_strategy_machine_matches_oracle(small_index, dev_index):
    fm = FMOracle(small_index)
    opt = MemOptions()
    codes_list, codes, lens = _read_set(small_index)
    bufs = seed_strategy_machine(
        dev_index, jnp.asarray(codes), jnp.asarray(lens),
        opt.max_mem_intv, opt.min_seed_len + 1, codes.shape[1])
    m, n, k, l, s, cnt = map(np.asarray, bufs)
    for i, c in enumerate(codes_list):
        want = [(sm.m, sm.n, sm.k, sm.l, sm.s)
                for sm in fm.seed_strategy(c, 0, opt.max_mem_intv,
                                           opt.min_seed_len + 1)]
        got = [(int(m[i, j]), int(n[i, j]), int(k[i, j]),
                int(l[i, j]), int(s[i, j]))
               for j in range(int(cnt[i]))]
        assert got == want, f"read {i}: {got} != {want}"


def test_collect_smems_rl_matches_device_sweep(small_index, dev_index):
    """The two collectors must agree bit-exactly (both are used by the
    aligner depending on cfg.seed_engine)."""
    opt = MemOptions()
    _, codes, lens = _read_set(small_index)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    a = collect_smems_device(dev_index, jnp.asarray(codes),
                             jnp.asarray(lens), **kw)
    b = collect_smems_rl(dev_index, jnp.asarray(codes),
                         jnp.asarray(lens), **kw)
    ca, cb = np.asarray(a.cnt), np.asarray(b.cnt)
    assert (ca == cb).all()
    for fa, fb in zip(a[:5], b[:5]):
        fa, fb = np.asarray(fa), np.asarray(fb)
        for i in range(fa.shape[0]):
            assert (fa[i, :ca[i]] == fb[i, :ca[i]]).all()


@pytest.mark.parametrize("lanes", [3, 7, 19])
def test_collect_smems_rl_refill_bit_equal(small_index, dev_index,
                                           lanes):
    """Backlog-refill mode (worker lanes < reads, kt_for-style
    dynamic scheduling) must be bit-identical to one-lane-per-read
    for any lane count — including lane counts that don't divide the
    batch and a mid-batch zero-length read."""
    opt = MemOptions()
    _, codes, lens = _read_set(small_index)
    lens = lens.copy()
    lens[2] = 0          # mid-backlog dead read (EMF-resolved analog)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    a = collect_smems_rl(dev_index, jnp.asarray(codes),
                         jnp.asarray(lens), **kw)
    b = collect_smems_rl(dev_index, jnp.asarray(codes),
                         jnp.asarray(lens), lanes=lanes, **kw)
    ca, cb = np.asarray(a.cnt), np.asarray(b.cnt)
    assert (ca == cb).all()
    for fa, fb in zip(a[:5], b[:5]):
        fa, fb = np.asarray(fa), np.asarray(fb)
        for i in range(fa.shape[0]):
            assert (fa[i, :ca[i]] == fb[i, :ca[i]]).all(), (lanes, i)
