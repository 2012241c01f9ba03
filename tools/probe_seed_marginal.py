"""Marginal (call-overhead-free) cost of the seeding stage: run N
stacked batches through lax.scan inside ONE dispatch; slope between
N=1 and N=3 is the true per-batch device cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bwa_mem_scale_tpu.models.aligner import simulate_reads
from bwa_mem_scale_tpu.ops.smem_oh import collect_smems_oh
from bwa_mem_scale_tpu.ops.smem import SmemBuf


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi = al.fmi
    opt = al.opt
    B, L = bench.BATCH, bench.READ_LEN
    seed0 = int(time.time()) % 100000

    def stacked(n, tag):
        bs = [simulate_reads(al.idx.bns, B, L, seed=seed0 + 37 * n + i,
                             err_rate=0.01) for i in range(n)]
        cs = jnp.asarray(np.stack([np.asarray(c, np.int32)
                                   for c, _ in bs]))
        ls = jnp.asarray(np.stack([np.asarray(l, np.int32)
                                   for _, l in bs]))
        return cs, ls

    def collect(c, l):
        out = collect_smems_oh(
            fmi, c, l, min_seed_len=opt.min_seed_len,
            split_len=opt.split_len, split_width=opt.split_width,
            max_mem_intv=opt.max_mem_intv, max_out=L,
            emit_depth=24, stack_depth=24)
        return out.cnt.sum() + out.k.sum()

    @jax.jit
    def runN(cs, ls):
        def step(acc, cl):
            c, l = cl
            return acc + collect(c, l), 0
        acc, _ = jax.lax.scan(step, jnp.zeros((), fmi.pos_dtype),
                              (cs, ls))
        return acc

    res = {}
    for n in (1, 3):
        cs, ls = stacked(n, "w")
        np.asarray(runN(cs, ls))          # compile+warm
        ts = []
        for r in range(3):
            cs, ls = stacked(n, r)
            t0 = time.time()
            np.asarray(runN(cs, ls))
            ts.append(time.time() - t0)
        res[n] = min(ts)
        print(f"seed collect x{n}: {min(ts)*1e3:.1f} ms", file=sys.stderr)
    print(f"marginal per batch: {(res[3] - res[1]) / 2 * 1e3:.1f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
