"""One-hot (scatter-free) SMEM machines vs the readlane machines:
bit-identical output on every fixture class, with and without the
k-step tables."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.smem_rl import (collect_smems_rl,
                                           seed_strategy_machine)
from bwa_mem_scale_tpu.ops.smem_oh import (collect_smems_oh,
                                           seed_strategy_machine_oh)

from conftest import sample_reads


@pytest.fixture(scope="module")
def dev_index(small_index):
    return DeviceFMIndex.from_host(small_index)


def _read_set(small_index):
    reads = sample_reads(small_index.bns, 24, 101, seed=11,
                         err_rate=0.03)
    codes_list = [c.astype(np.int32) for c, _, _ in reads]
    withn = codes_list[0].copy()
    withn[10] = 4
    withn[50] = 4
    codes_list.append(withn)
    rep = np.tile(small_index.bns.seq[100:130].astype(np.int32),
                  4)[:101]
    codes_list.append(rep)
    codes_list.append(codes_list[1][:40].copy())
    codes_list.append(codes_list[2][:0].copy())       # empty read
    B = len(codes_list)
    L = 101
    codes = np.full((B, L), 4, dtype=np.int32)
    for i, c in enumerate(codes_list):
        codes[i, : len(c)] = c
    lens = np.array([len(c) for c in codes_list], dtype=np.int32)
    return codes, lens


def _assert_bufs_equal(a, b):
    an, bn = map(np.asarray, (a.cnt, b.cnt))
    np.testing.assert_array_equal(an, bn)
    for f in ("m", "n", "k", "l", "s"):
        av = np.asarray(getattr(a, f))
        bv = np.asarray(getattr(b, f))
        mask = np.arange(av.shape[1])[None, :] < np.minimum(
            an, av.shape[1])[:, None]
        np.testing.assert_array_equal(np.where(mask, av, 0),
                                      np.where(mask, bv, 0))


def _collect_both(fmi, codes, lens):
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    a = collect_smems_rl(fmi, jnp.asarray(codes), jnp.asarray(lens),
                         **kw)
    b = collect_smems_oh(fmi, jnp.asarray(codes), jnp.asarray(lens),
                         **kw)
    return a, b


def test_collect_oh_equals_rl(small_index, dev_index):
    codes, lens = _read_set(small_index)
    a, b = _collect_both(dev_index, codes, lens)
    _assert_bufs_equal(a, b)


def test_strategy_oh_equals_rl(small_index, dev_index):
    codes, lens = _read_set(small_index)
    a = seed_strategy_machine(dev_index, jnp.asarray(codes),
                              jnp.asarray(lens), 20, 20, 101)
    b = seed_strategy_machine_oh(dev_index, jnp.asarray(codes),
                                 jnp.asarray(lens), 20, 20, 101)
    _assert_bufs_equal(a, b)


@pytest.mark.parametrize("K", [2, 3])
def test_collect_oh_kstep(small_index, K):
    from bwa_mem_scale_tpu.index.kstep import build_cp2
    cp2 = build_cp2(small_index, K=K)
    fmi2 = DeviceFMIndex.from_host(small_index, cp2=cp2)
    fmi1 = DeviceFMIndex.from_host(small_index)
    codes, lens = _read_set(small_index)
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    ref = collect_smems_oh(fmi1, jnp.asarray(codes),
                           jnp.asarray(lens), **kw)
    got = collect_smems_oh(fmi2, jnp.asarray(codes),
                           jnp.asarray(lens), **kw)
    _assert_bufs_equal(ref, got)


def test_strategy_oh_kstep(small_index):
    from bwa_mem_scale_tpu.index.kstep import build_cp2
    cp2 = build_cp2(small_index, K=2)
    fmi2 = DeviceFMIndex.from_host(small_index, cp2=cp2)
    fmi1 = DeviceFMIndex.from_host(small_index)
    codes, lens = _read_set(small_index)
    a = seed_strategy_machine_oh(fmi1, jnp.asarray(codes),
                                 jnp.asarray(lens), 20, 20, 101)
    b = seed_strategy_machine_oh(fmi2, jnp.asarray(codes),
                                 jnp.asarray(lens), 20, 20, 101)
    _assert_bufs_equal(a, b)


def test_collect_oh_staged_narrowing(small_index, dev_index,
                                     monkeypatch):
    """Stage compaction (lockstep-tail fix) must be bit-identical to
    the single-stage machine at any width schedule."""
    codes, lens = _read_set(small_index)
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    monkeypatch.setenv("BWATPU_SEED_STAGES", "0")
    ref = collect_smems_oh(dev_index, jnp.asarray(codes),
                           jnp.asarray(lens), **kw)
    for sched in ("16,8", "13,5,2", "1"):
        monkeypatch.setenv("BWATPU_SEED_STAGES", sched)
        got = collect_smems_oh(dev_index, jnp.asarray(codes),
                               jnp.asarray(lens), **kw)
        _assert_bufs_equal(ref, got)


def test_collect_oh_skinny_buffers(small_index, dev_index):
    """emit_depth/stack_depth shrink HBM state; non-overflowing reads
    must be bit-identical, overflowing reads must report cnt >=
    capacity (the retry-ladder signal) rather than silently truncate."""
    codes, lens = _read_set(small_index)
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv)
    ref = collect_smems_oh(dev_index, jnp.asarray(codes),
                           jnp.asarray(lens), **kw)
    ref_cnt = np.asarray(ref.cnt)
    for ed, sd in ((24, 24), (4, 3)):
        got = collect_smems_oh(dev_index, jnp.asarray(codes),
                               jnp.asarray(lens), emit_depth=ed,
                               stack_depth=sd, **kw)
        got_cnt = np.asarray(got.cnt)
        cap = got.m.shape[1]
        of = got_cnt >= cap
        # overflow reads: flagged, not silently wrong
        # clean reads: identical entry lists
        for f in ("m", "n", "k", "l", "s"):
            gv, rv = np.asarray(getattr(got, f)), np.asarray(
                getattr(ref, f))
            for i in range(len(ref_cnt)):
                if of[i]:
                    continue
                assert got_cnt[i] == ref_cnt[i], (ed, sd, i)
                np.testing.assert_array_equal(
                    gv[i, :got_cnt[i]], rv[i, :got_cnt[i]],
                    err_msg=f"field {f} read {i} ed={ed} sd={sd}")
    # the tightest config must flag at least one read on this set
    got = collect_smems_oh(dev_index, jnp.asarray(codes),
                           jnp.asarray(lens), emit_depth=4,
                           stack_depth=3, **kw)
    assert (np.asarray(got.cnt) >= got.m.shape[1]).any()
