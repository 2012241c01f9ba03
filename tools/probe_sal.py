"""Break down the SAL stage (ops/sal.expand_and_lookup) on chip.

Run:  BENCH_SEED_ENGINE=readlane python tools/probe_sal.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.models.aligner import simulate_reads
from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl
from bwa_mem_scale_tpu.ops.sal import expand_and_lookup

REPS = 4


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi = al.fmi
    opt = MemOptions()
    cfg = al.cfg
    B, L = bench.BATCH, bench.READ_LEN
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv, max_out=L)

    batches = [simulate_reads(al.idx.bns, B, L, seed=700 + i,
                              err_rate=0.01) for i in range(REPS)]
    bufs_list = []
    seed_jit = jax.jit(lambda f, c, l: collect_smems_rl(f, c, l, **kw))
    for c, l in batches:
        bufs = seed_jit(fmi, jnp.asarray(np.asarray(c, np.int32)),
                        jnp.asarray(np.asarray(l, np.int32)))
        np.asarray(bufs.cnt.sum())
        bufs_list.append(jax.tree_util.tree_map(jnp.asarray, bufs))

    C = cfg.max_coords

    full = jax.jit(lambda f, b: expand_and_lookup(
        f, b, opt.max_occ, C)[0].sum())

    def part_noss(f, b):
        # same math minus the searchsorted: use a FIXED seed_idx map
        Bv, M = b.m.shape
        slot = jnp.arange(C)[None, :]
        seed_idx = (slot % M).astype(jnp.int32)
        bidx = jnp.arange(Bv)[:, None]
        pos = b.k[bidx, seed_idx] + (slot // M).astype(b.s.dtype)
        out = f.sa_samples[pos.astype(jnp.int64)
                           % f.sa_samples.shape[0]]
        return out.sum()
    noss = jax.jit(part_noss)

    def part_ss(f, b):
        Bv, M = b.m.shape
        valid = jnp.arange(M)[None, :] < b.cnt[:, None]
        n_i = jnp.where(valid, jnp.minimum(b.s, opt.max_occ),
                        0).astype(jnp.int32)
        csum = jnp.cumsum(n_i, axis=1)
        slot = jnp.arange(C)[None, :]
        seed_idx = jax.vmap(
            lambda cs, sl: jnp.searchsorted(cs, sl, side="right")
        )(csum, jnp.broadcast_to(slot, (Bv, C))).astype(jnp.int32)
        return seed_idx.sum()
    ss = jax.jit(part_ss)

    def timeit(name, fn):
        r = fn(fmi, bufs_list[0])
        np.asarray(r)
        t0 = time.time()
        for b in bufs_list:
            np.asarray(fn(fmi, b))
        dt = (time.time() - t0) / REPS
        print(f"{name:28s} {dt:8.3f} s/batch")

    timeit("expand_and_lookup full", full)
    timeit("searchsorted only", ss)
    timeit("gathers only (no ss)", noss)


if __name__ == "__main__":
    main()
