"""Intra-extend device profile: times jitted PREFIXES of
seed_chain_extend at each `cut` point (pipeline/align.py), so the
0.3+ s 'filter+BSW+rest' block from tools/bench_stages.py resolves
into candidate-enumeration / sequence-gather / BSW-round costs.

Run on the real chip:  python tools/bench_extend.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bwa_mem_scale_tpu.models.aligner import simulate_reads
from bwa_mem_scale_tpu.pipeline.align import seed_chain_extend

REPS = int(os.environ.get("BENCH_REPS", 3))
CUTS = ["seed", "sal", "chain", "enum", "seqs", "bsw1", "bswL",
        "bswLR1", None]


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    B, L = bench.BATCH, bench.READ_LEN
    seed0 = int(time.time()) % 100000
    batches = [simulate_reads(al.idx.bns, B, L, seed=seed0 + i,
                              err_rate=0.01) for i in range(REPS + 1)]
    batches = [(jnp.asarray(np.asarray(c, np.int32)),
                jnp.asarray(np.asarray(l, np.int32)))
               for c, l in batches]

    prev = None
    for cut in CUTS:
        fn = jax.jit(partial(seed_chain_extend, opt=al.opt, cfg=al.cfg,
                             L=L, fma=None, ert=None, cut=cut))

        def sync(r):
            np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]

        sync(fn(al.fmi, al.dbns, *batches[0]))        # compile+warm
        t0 = time.time()
        for c, l in batches[1:]:
            sync(fn(al.fmi, al.dbns, c, l))
        dt = (time.time() - t0) / REPS
        name = cut or "full"
        extra = f"  (+{dt - prev:.3f})" if prev is not None else ""
        print(f"{name:8s} {dt:7.3f} s/batch{extra}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
