"""Device SA-lookup and chaining kernels vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.smem import collect_smems_device
from bwa_mem_scale_tpu.ops.sal import sa_lookup, expand_and_lookup
from bwa_mem_scale_tpu.ops.chain import (DeviceBns, chain_seeds_device,
                                         chain_weights, frac_rep_device,
                                         chain_filter_device)
from bwa_mem_scale_tpu.ref.fm import FMOracle
from bwa_mem_scale_tpu.ref import chain as chain_ref

from conftest import sample_reads


@pytest.fixture(scope="module")
def dev_index(small_index):
    return DeviceFMIndex.from_host(small_index)


@pytest.fixture(scope="module")
def dev_bns(small_index):
    return DeviceBns.from_host(small_index.bns)


def test_sa_lookup_batch(small_index, dev_index):
    fm = FMOracle(small_index)
    rng = np.random.RandomState(3)
    pos = rng.randint(0, small_index.seq_len, size=512)
    got = np.asarray(sa_lookup(dev_index, jnp.asarray(pos),
                               jnp.ones(512, dtype=bool)))
    for i, p in enumerate(pos):
        assert got[i] == fm.sa_entry(int(p))


def test_sa_lookup_staged_matches_unstaged(small_index, dev_index,
                                           monkeypatch):
    """Explicit BWATPU_SAL_STAGES widths force the staged-narrowing
    compaction/flush/orow-scatter path at small N; output must equal
    the unstaged walk (the auto threshold only engages at >=32k
    lanes, far above unit-test widths)."""
    import os
    fm = FMOracle(small_index)
    rng = np.random.RandomState(7)
    pos = rng.randint(0, small_index.seq_len, size=512)
    valid = rng.rand(512) < 0.9
    monkeypatch.setitem(os.environ, "BWATPU_SAL_STAGES", "256,64,16")
    staged = np.asarray(sa_lookup(dev_index, jnp.asarray(pos),
                                  jnp.asarray(valid)))
    monkeypatch.setitem(os.environ, "BWATPU_SAL_STAGES", "0")
    flat = np.asarray(sa_lookup(dev_index, jnp.asarray(pos),
                                jnp.asarray(valid)))
    np.testing.assert_array_equal(staged, flat)
    for i, p in enumerate(pos):
        if valid[i]:
            assert staged[i] == fm.sa_entry(int(p))


def _device_smems(dev_index, opt, codes_list):
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
    return bufs, jnp.asarray(lens)


def test_chain_device_matches_oracle(small_index, dev_index, dev_bns):
    fm = FMOracle(small_index)
    opt = MemOptions()
    reads = sample_reads(small_index.bns, 12, 120, seed=11, err_rate=0.03)
    codes_list = [c for c, _, _ in reads]
    bufs, lens = _device_smems(dev_index, opt, codes_list)

    rbeg, seed_idx, coord_valid, total, _of = expand_and_lookup(
        dev_index, bufs, opt.max_occ, max_coords=256)
    ch = chain_seeds_device(dev_bns, bufs, rbeg, seed_idx, coord_valid,
                            w=opt.w, max_chain_gap=opt.max_chain_gap,
                            max_chains=32, max_seeds_per_chain=16)
    assert not bool(np.asarray(ch.overflow).any())
    w_dev = np.asarray(chain_weights(ch))
    fr_dev = np.asarray(frac_rep_device(bufs, lens, opt.max_occ))

    for i, codes in enumerate(codes_list):
        smems = fm.collect_smems(codes, 0, opt)
        chains = chain_ref.chain_seeds(fm, opt, small_index.bns, codes,
                                       0, smems)
        n_dev = int(np.asarray(ch.n)[i])
        assert n_dev == len(chains), f"read {i}"
        # compare in key-sorted order
        slots = np.asarray(ch.slot)[i, :n_dev]
        keys = np.asarray(ch.key)[i, :n_dev]
        for j, c in enumerate(chains):
            slot = slots[j]
            assert keys[j] == c.pos
            assert int(np.asarray(ch.rid)[i, slot]) == c.rid
            nsd = int(np.asarray(ch.n_seeds)[i, slot])
            assert nsd == c.n
            got_seeds = [
                (int(np.asarray(ch.seed_qbeg)[i, slot, k]),
                 int(np.asarray(ch.seed_rbeg)[i, slot, k]),
                 int(np.asarray(ch.seed_len)[i, slot, k]))
                for k in range(nsd)]
            want_seeds = [(s.qbeg, s.rbeg, s.len) for s in c.seeds]
            assert got_seeds == want_seeds
            assert w_dev[i, slot] == chain_ref.chain_weight(c)
        if chains:
            assert abs(fr_dev[i] - chains[0].frac_rep) < 1e-6


def test_chain_filter_device_matches_oracle(small_index, dev_index, dev_bns):
    fm = FMOracle(small_index)
    opt = MemOptions()
    reads = sample_reads(small_index.bns, 12, 120, seed=13, err_rate=0.04)
    codes_list = [c for c, _, _ in reads]
    bufs, lens = _device_smems(dev_index, opt, codes_list)
    rbeg, seed_idx, coord_valid, total, _of = expand_and_lookup(
        dev_index, bufs, opt.max_occ, max_coords=256)
    ch = chain_seeds_device(dev_bns, bufs, rbeg, seed_idx, coord_valid,
                            w=opt.w, max_chain_gap=opt.max_chain_gap,
                            max_chains=32, max_seeds_per_chain=16)
    order, kept, w_by_slot = chain_filter_device(
        ch, dev_bns, min_chain_weight=opt.min_chain_weight,
        mask_level=opt.mask_level, max_chain_gap=opt.max_chain_gap,
        drop_ratio=opt.drop_ratio, min_seed_len=opt.min_seed_len,
        max_chain_extend=opt.max_chain_extend)
    order = np.asarray(order)
    kept = np.asarray(kept)

    for i, codes in enumerate(codes_list):
        smems = fm.collect_smems(codes, 0, opt)
        chains = chain_ref.chain_seeds(fm, opt, small_index.bns, codes,
                                       0, smems)
        want = chain_ref.chain_flt(opt, chains)
        # device: kept chains in weight-sorted order
        got = []
        for pos_ in range(order.shape[1]):
            if kept[i, pos_] > 0:
                slot = order[i, pos_]
                got.append((int(np.asarray(ch.key)[i, slot] if False else 0),
                            slot))
        got_slots = [g[1] for g in got]
        got_w = [int(np.asarray(w_by_slot)[i, s]) for s in got_slots]
        want_w = [c.w for c in want]
        assert got_w == want_w, f"read {i}: weights {got_w} != {want_w}"
        # seed sets must match chain-for-chain
        for (slot, wc) in zip(got_slots, want):
            nsd = int(np.asarray(ch.n_seeds)[i, slot])
            got_seeds = [
                (int(np.asarray(ch.seed_qbeg)[i, slot, k]),
                 int(np.asarray(ch.seed_rbeg)[i, slot, k]))
                for k in range(nsd)]
            want_seeds = [(s.qbeg, s.rbeg) for s in wc.seeds]
            assert got_seeds == want_seeds
