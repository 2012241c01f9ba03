"""On-chip comparison of the two SMEM seeding engines.

Measures collect_smems_device (position-parallel sweep, with and
without the FMA ladder) against collect_smems_rl (read-per-lane
machine) on the bench workload, reporting seconds per 4096-read
batch. Run on the real chip:  python tools/bench_seed_engines.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.index.artifacts import load_index, save_index
from bwa_mem_scale_tpu.index.build import build_index
from bwa_mem_scale_tpu.models.aligner import demo_genome, simulate_reads
from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
from bwa_mem_scale_tpu.ops.fma import build_fma_table, load_fma, save_fma
from bwa_mem_scale_tpu.ops.smem import collect_smems_device
from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl

GENOME_BP = int(os.environ.get("BENCH_GENOME_BP", 4_600_000))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 101))
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
REPS = int(os.environ.get("BENCH_REPS", 4))

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_index.tpuidx.npz")


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    prefix = CACHE[: -len(".tpuidx.npz")]
    if os.path.exists(CACHE):
        idx = load_index(CACHE)
    else:
        bns = demo_genome(GENOME_BP, seed=7, n_contigs=1)
        idx = build_index(bns, sa_compx=0)
        save_index(idx, prefix)
    fma_path = f"{prefix}.fma11.npz"
    if os.path.exists(fma_path):
        fma = load_fma(fma_path)
    else:
        fma = build_fma_table(DeviceFMIndex.from_host(idx), K=11)
        save_fma(fma, prefix)

    fmi = DeviceFMIndex.from_host(idx)
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv)

    batches = [simulate_reads(idx.bns, BATCH, READ_LEN, seed=100 + i,
                              err_rate=0.01) for i in range(REPS)]
    batches = [(jnp.asarray(np.asarray(c, np.int32)),
                jnp.asarray(np.asarray(l, np.int32))) for c, l in batches]

    sweep = jax.jit(lambda f, c, l: collect_smems_device(
        f, c, l, max_out=READ_LEN, **kw))
    sweep_fma = jax.jit(lambda f, c, l, t: collect_smems_device(
        f, c, l, max_out=READ_LEN, fma=t, **kw))
    rl = jax.jit(lambda f, c, l: collect_smems_rl(
        f, c, l, max_out=READ_LEN, **kw))

    def timeit(name, fn, *args):
        out = fn(*args)  # compile
        np.asarray(out.cnt.sum())
        t0 = time.time()
        for c, l in batches:
            out = fn(*((args[0], c, l) + args[3:]))
            np.asarray(out.cnt.sum())
        dt = (time.time() - t0) / REPS
        print(f"{name:24s} {dt:8.3f} s/batch   "
              f"({BATCH / dt:8.0f} reads/s seeding-only)")
        return out

    c0, l0 = batches[0]
    a = timeit("sweep", sweep, fmi, c0, l0)
    b = timeit("sweep+fma", sweep_fma, fmi, c0, l0,
               fma.to_device(fmi.pos_dtype))
    c = timeit("readlane", rl, fmi, c0, l0)

    # per-pass breakdown with tick counts
    from bwa_mem_scale_tpu.ops.smem import SmemBuf
    from bwa_mem_scale_tpu.ops.smem_rl import (one_pos_machine,
                                               seed_strategy_machine)
    opt2 = MemOptions()
    B = BATCH

    @jax.jit
    def p1(f, c, l):
        bidx = jnp.arange(B, dtype=jnp.int32)
        return one_pos_machine(
            f, c, l, bidx, jnp.zeros((B,), jnp.int32),
            jnp.ones((B,), jnp.int32), l > 0, True,
            opt2.min_seed_len, READ_LEN,
            SmemBuf.empty(B, READ_LEN, f.pos_dtype), with_ticks=True)

    @jax.jit
    def p3(f, c, l):
        return seed_strategy_machine(
            f, c, l, opt2.max_mem_intv, opt2.min_seed_len + 1,
            READ_LEN, with_ticks=True)

    for name, fn in (("pass1 machine", p1), ("pass3 machine", p3)):
        out, ticks = fn(fmi, c0, l0)
        np.asarray(out.cnt.sum())
        t0 = time.time()
        for cc_, ll_ in batches:
            out, ticks = fn(fmi, cc_, ll_)
            np.asarray(out.cnt.sum())
        dt = (time.time() - t0) / REPS
        done_at = None
        if isinstance(ticks, tuple):
            ticks, done_at = ticks
        print(f"{name:24s} {dt:8.3f} s/batch   ticks={int(ticks)}  "
              f"({dt / max(int(ticks), 1) * 1e3:.3f} ms/tick)")
        if done_at is not None:
            d = np.asarray(done_at)
            q = np.percentile(d, [50, 90, 99, 99.9])
            print(f"{'':24s} done_at p50={q[0]:.0f} p90={q[1]:.0f} "
                  f"p99={q[2]:.0f} p99.9={q[3]:.0f} max={d.max()}")

    ca, cc = np.asarray(a.cnt), np.asarray(c.cnt)
    same = (ca == cc).all() and all(
        (np.asarray(fa)[i, :ca[i]] == np.asarray(fc)[i, :ca[i]]).all()
        for fa, fc in zip(a[:5], c[:5]) for i in range(min(64, BATCH)))
    print(f"* sweep vs readlane identical (64-read spot check): {same}")


if __name__ == "__main__":
    main()
