"""2-step (bigram) FM extension — backward_ext2/forward_ext2 must be
bit-identical to two chained single-step extensions for every
reachable interval, including sentinel-crossing ones, and the sweep
engine with the table present must reproduce its 1-step output."""

import numpy as np
import pytest

from conftest import make_genome, sample_reads

from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.index.kstep import (build_cp2, save_cp2,
                                           load_cp2, extract_bwt)
from bwa_mem_scale_tpu.ops.occ import (DeviceFMIndex, backward_ext,
                                       backward_ext2, forward_ext,
                                       forward_ext2)


@pytest.fixture(scope="module")
def k2_setup(tmp_path_factory):
    bns = make_genome(9000, seed=13)
    idx = build_index(bns)
    d = tmp_path_factory.mktemp("k2")
    cp2 = load_cp2(save_cp2(build_cp2(idx), str(d / "g")))
    fmi1 = DeviceFMIndex.from_host(idx)
    fmi2 = DeviceFMIndex.from_host(idx, cp2=cp2)
    return idx, fmi1, fmi2


@pytest.fixture(scope="module")
def k3_setup(k2_setup, tmp_path_factory):
    idx, fmi1, _ = k2_setup
    d = tmp_path_factory.mktemp("k3")
    cp3 = load_cp2(save_cp2(build_cp2(idx, K=3), str(d / "g")))
    assert cp3.K == 3
    return idx, fmi1, DeviceFMIndex.from_host(idx, cp2=cp3)


def test_extract_bwt_roundtrip(k2_setup):
    """The mask-decoded BWT must be a permutation statistic match:
    char counts equal the C-array deltas, sentinel exactly once."""
    idx, _, _ = k2_setup
    bwt = extract_bwt(idx)
    assert len(bwt) == idx.seq_len
    assert int((bwt == 4).sum()) == 1
    assert int(np.flatnonzero(bwt == 4)[0]) == idx.sentinel_index
    cnt = np.bincount(bwt, minlength=5)
    deltas = np.diff(np.asarray(idx.count, np.int64))
    np.testing.assert_array_equal(cnt[:4], deltas)


def _random_intervals(idx, fmi1, n, seed):
    """Reachable (k, l, s) bi-intervals: extend random 1-base
    intervals backward by random chars a few times."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    a0 = rng.randint(0, 4, n)
    count = np.asarray(idx.count, np.int64)
    k = count[a0].astype(np.int32)
    l = count[3 - a0].astype(np.int32)
    s = (count[a0 + 1] - count[a0]).astype(np.int32)
    for _ in range(rng.randint(0, 4)):
        c = jnp.asarray(rng.randint(0, 4, n), jnp.int32)
        k2, l2, s2 = backward_ext(fmi1, jnp.asarray(k), jnp.asarray(l),
                                  jnp.asarray(s), c)
        alive = np.asarray(s2) > 0
        k = np.where(alive, np.asarray(k2), k)
        l = np.where(alive, np.asarray(l2), l)
        s = np.where(alive, np.asarray(s2), s)
    return (np.asarray(k, np.int32), np.asarray(l, np.int32),
            np.asarray(s, np.int32))


@pytest.mark.parametrize("min_seed_len,max_mem_intv", [(10, 20), (3, 4)])
def test_sweep_2step_matches_1step(k2_setup, min_seed_len,
                                   max_mem_intv):
    """collect_smems_device with the bigram table present must emit
    the identical SmemBuf (all passes: sweep, reseed, merged pass-3),
    N bases and ragged lengths included."""
    from bwa_mem_scale_tpu.ops.smem import collect_smems_device
    idx, fmi1, fmi2 = k2_setup
    reads = sample_reads(idx.bns, 24, 48, seed=6, err_rate=0.05)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    rng = np.random.RandomState(8)
    codes[rng.rand(*codes.shape) < 0.01] = 4
    lens = np.full(24, 48, dtype=np.int32)
    lens[::5] = 48 - rng.randint(0, 9)
    kw = dict(min_seed_len=min_seed_len,
              split_len=int(min_seed_len * 1.5), split_width=10,
              max_mem_intv=max_mem_intv, max_out=48)
    a = collect_smems_device(fmi1, codes, lens, **kw)
    b = collect_smems_device(fmi2, codes, lens, **kw)
    for f in ("m", "n", "k", "l", "s", "cnt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)),
                                      err_msg=f)
    assert int(np.asarray(a.cnt).sum()) > 0
    # FMA fast-forward + 2-step body together (the sweep engine's
    # production configuration)
    from bwa_mem_scale_tpu.ops.fma import build_fma_table
    fma = build_fma_table(fmi1, K=6).to_device(fmi1.pos_dtype)
    c = collect_smems_device(fmi2, codes, lens, fma=fma, **kw)
    for f in ("m", "n", "k", "l", "s", "cnt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(c, f)),
                                      err_msg=f"fma+{f}")


def test_ext3_equals_three_ext1(k3_setup):
    """Trigram extension == three chained single steps, all 64 char
    triples, over reachable and sentinel-crossing intervals."""
    import jax.numpy as jnp
    from bwa_mem_scale_tpu.ops.occ import backward_ext3
    idx, fmi1, fmi3 = k3_setup
    k, l, s = _random_intervals(idx, fmi1, 256, seed=23)
    count = np.asarray(idx.count, np.int64)
    k = np.concatenate([k, [0]])
    l = np.concatenate([l, [0]])
    s = np.concatenate([s, [idx.seq_len]])
    n = len(k)
    kj, lj, sj = jnp.asarray(k), jnp.asarray(l), jnp.asarray(s)
    for c1v in range(4):
        for c2v in range(4):
            for c3v in range(4):
                cs = [jnp.full((n,), v, jnp.int32)
                      for v in (c1v, c2v, c3v)]
                m1 = backward_ext(fmi1, kj, lj, sj, cs[0])
                m2 = backward_ext(fmi1, *m1, cs[1])
                m3 = backward_ext(fmi1, *m2, cs[2])
                t1, t2, t3 = backward_ext3(fmi3, kj, lj, sj, *cs)
                for got, want, nm, aliveref in (
                        (t1, m1, "1", s > 0),
                        (t2, m2, "2", np.asarray(m1[2]) > 0),
                        (t3, m3, "3", np.asarray(m2[2]) > 0)):
                    alive = aliveref
                    for g, w, f in zip(got, want, "kls"):
                        np.testing.assert_array_equal(
                            np.asarray(g)[alive], np.asarray(w)[alive],
                            err_msg=f"step{nm} {f} "
                                    f"{c1v}{c2v}{c3v}")


@pytest.mark.parametrize("lanes", [None, 7])
def test_machine_3step_matches_1step(k3_setup, lanes):
    """The readlane machine with the trigram table: FWD consumes
    three bases per tick; output must be bit-identical."""
    from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl
    idx, fmi1, fmi3 = k3_setup
    reads = sample_reads(idx.bns, 24, 48, seed=16, err_rate=0.05)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    rng = np.random.RandomState(18)
    codes[rng.rand(*codes.shape) < 0.01] = 4
    lens = np.full(24, 48, dtype=np.int32)
    lens[::5] = 48 - rng.randint(0, 9)
    kw = dict(min_seed_len=10, split_len=15, split_width=10,
              max_mem_intv=20, max_out=48, lanes=lanes)
    a = collect_smems_rl(fmi1, codes, lens, **kw)
    b = collect_smems_rl(fmi3, codes, lens, **kw)
    for f in ("m", "n", "k", "l", "s", "cnt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)),
                                      err_msg=f)
    assert int(np.asarray(a.cnt).sum()) > 0


@pytest.mark.parametrize("lanes", [None, 7])
def test_machine_2step_matches_1step(k2_setup, lanes):
    """collect_smems_rl (the readlane machine, bench engine) with the
    bigram table: FWD phase consumes two bases per tick; output must
    be bit-identical, with and without backlog lane refill."""
    from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl
    idx, fmi1, fmi2 = k2_setup
    reads = sample_reads(idx.bns, 24, 48, seed=16, err_rate=0.05)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    rng = np.random.RandomState(18)
    codes[rng.rand(*codes.shape) < 0.01] = 4
    lens = np.full(24, 48, dtype=np.int32)
    lens[::5] = 48 - rng.randint(0, 9)
    kw = dict(min_seed_len=10, split_len=15, split_width=10,
              max_mem_intv=20, max_out=48, lanes=lanes)
    a = collect_smems_rl(fmi1, codes, lens, **kw)
    b = collect_smems_rl(fmi2, codes, lens, **kw)
    for f in ("m", "n", "k", "l", "s", "cnt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)),
                                      err_msg=f)
    assert int(np.asarray(a.cnt).sum()) > 0


def test_aligner_records_identical_with_cp2(k2_setup):
    """Full pipeline (seed→chain→extend→finalize) record equality
    with and without the bigram table, SE and PE."""
    from bwa_mem_scale_tpu.config import MemOptions
    from bwa_mem_scale_tpu.index.kstep import build_cp2
    from bwa_mem_scale_tpu.pipeline.align import (TpuAligner,
                                                  PipelineConfig)
    idx, _, _ = k2_setup
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                         max_seeds_per_chain=8, max_regs=8)
    reads = sample_reads(idx.bns, 16, 48, seed=21, err_rate=0.03)
    codes = np.stack([r[0] for r in reads]).astype(np.int32)
    lens = np.full(16, 48, np.int32)
    a1 = TpuAligner(idx, MemOptions(), cfg)
    a2 = TpuAligner(idx, MemOptions(), cfg, cp2=build_cp2(idx))
    r1 = a1.align_and_finalize(codes, lens)
    r2 = a2.align_and_finalize(codes, lens)
    for recs1, recs2 in zip(r1, r2):
        assert len(recs1) == len(recs2)
        for x, y in zip(recs1, recs2):
            assert vars(x) == vars(y)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_ext2_equals_two_ext1(k2_setup, direction):
    import jax.numpy as jnp
    idx, fmi1, fmi2 = k2_setup
    N = 512
    k, l, s = _random_intervals(idx, fmi1, N, seed=3)
    # include the full-text interval (contains the sentinel row) and
    # every 1-base interval
    count = np.asarray(idx.count, np.int64)
    k = np.concatenate([k, [0], count[:4].astype(np.int32)])
    l = np.concatenate([l, [0], count[3::-1].astype(np.int32)[:4]])
    s = np.concatenate(
        [s, [idx.seq_len],
         (count[1:5] - count[:4]).astype(np.int32)])
    n = len(k)
    rng = np.random.RandomState(4)
    for c1v in range(4):
        for c2v in range(4):
            c1 = jnp.full((n,), c1v, jnp.int32)
            c2 = jnp.full((n,), c2v, jnp.int32)
            kj, lj, sj = (jnp.asarray(k), jnp.asarray(l),
                          jnp.asarray(s))
            if direction == "backward":
                m1 = backward_ext(fmi1, kj, lj, sj, c1)
                m2 = backward_ext(fmi1, *m1, c2)
                (t1, t2) = backward_ext2(fmi2, kj, lj, sj, c1, c2)
            else:
                m1 = forward_ext(fmi1, kj, lj, sj, c1)
                m2 = forward_ext(fmi1, *m1, c2)
                (t1, t2) = forward_ext2(fmi2, kj, lj, sj, c1, c2)
            for got, want, nm in zip(t1 + t2, m1 + m2,
                                     ("k1", "l1", "s1", "k2", "l2",
                                      "s2")):
                # the chained single-step k/l after a dead first step
                # are garbage the machines never read; compare where
                # the walk is still alive at that step
                alive = (np.asarray(m1[2]) > 0 if nm in ("k2", "l2",
                                                         "s2")
                         else s > 0)
                np.testing.assert_array_equal(
                    np.asarray(got)[alive], np.asarray(want)[alive],
                    err_msg=f"{direction} {nm} c1={c1v} c2={c2v}")
