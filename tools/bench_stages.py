"""Cumulative device-stage timing for the extend pipeline.

Times jit programs that run progressively more of seed_chain_extend:
seed | seed+SAL | seed+SAL+chain | full. Differences approximate
per-stage device cost (XLA fusion shifts boundaries slightly).

Run on the real chip:  python tools/bench_stages.py
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
from bwa_mem_scale_tpu.ops.smem_oh import collect_smems_oh
from bwa_mem_scale_tpu.ops.sal import expand_and_lookup
from bwa_mem_scale_tpu.ops.chain import (chain_seeds_device,
                                         chain_filter_device,
                                         frac_rep_device)
from bwa_mem_scale_tpu.pipeline.align import (seed_chain_extend,
                                              PipelineConfig)

REPS = int(os.environ.get("BENCH_REPS", 4))


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi, dbns = al.fmi, al.dbns
    opt = al.opt
    cfg = al.cfg
    B, L = bench.BATCH, bench.READ_LEN

    batches = [simulate_reads(al.idx.bns, B, L, seed=7000 + int(time.time()) % 9999 + i,
                              err_rate=0.01) for i in range(REPS)]
    batches = [(jnp.asarray(np.asarray(c, np.int32)),
                jnp.asarray(np.asarray(l, np.int32)))
               for c, l in batches]

    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              max_out=L)

    @jax.jit
    def s1(f, c, l):
        return collect_smems_oh(f, c, l, **kw).cnt

    @jax.jit
    def s2(f, c, l):
        bufs = collect_smems_oh(f, c, l, **kw)
        rbeg, seed_idx, cv, total, _of = expand_and_lookup(
            f, bufs, opt.max_occ, cfg.max_coords)
        return rbeg.sum() + total.sum()

    @jax.jit
    def s3(f, d, c, l):
        bufs = collect_smems_oh(f, c, l, **kw)
        rbeg, seed_idx, cv, total, _of = expand_and_lookup(
            f, bufs, opt.max_occ, cfg.max_coords)
        ch = chain_seeds_device(
            d, bufs, rbeg, seed_idx, cv, w=opt.w,
            max_chain_gap=opt.max_chain_gap, max_chains=cfg.max_chains,
            max_seeds_per_chain=cfg.max_seeds_per_chain)
        return ch.n_seeds.sum() + ch.seed_rbeg.sum()

    @jax.jit
    def s4(f, d, c, l):
        ch = chain_filter_device  # noqa - full pipeline
        from functools import partial
        out = seed_chain_extend(f, d, c, l, L=L, opt=opt, cfg=cfg,
                                fma=None, ert=None)
        return out["packed"].sum()

    def timeit(name, fn, *args):
        r = fn(*args)
        np.asarray(r)
        t0 = time.time()
        for c, l in batches:
            r = fn(*(args[:-2] + (c, l)))
            np.asarray(r if r.ndim == 0 else r.sum())
        dt = (time.time() - t0) / REPS
        print(f"{name:22s} {dt:8.3f} s/batch")
        return dt

    c0, l0 = batches[0]
    t1 = timeit("seed", s1, fmi, c0, l0)
    t2 = timeit("seed+SAL", s2, fmi, c0, l0)
    t3 = timeit("seed+SAL+chain", s3, fmi, dbns, c0, l0)
    t4 = timeit("full extend", s4, fmi, dbns, c0, l0)
    print(f"  -> SAL {t2 - t1:.3f}  chain {t3 - t2:.3f}  "
          f"filter+BSW+rest {t4 - t3:.3f}")


if __name__ == "__main__":
    main()
