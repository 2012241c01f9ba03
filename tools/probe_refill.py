"""Real-chip probes for the lane-refill seeding machine.

1. While-loop tick floor: per-iteration cost of a trivial dependent
   op vs the full machine tick, at several lane counts.
2. Seeding throughput sweep over (batch, lanes): reads/s of the
   three-pass collect at each configuration.

Run on the TPU (axon) when the tunnel is up:
  python tools/probe_refill.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def tick_floor(lanes, iters=300):
    """Per-iteration cost of a dependent-gather while_loop."""
    table = jnp.asarray(
        np.random.randint(0, 1 << 30, size=(1 << 18, 8), dtype=np.int32))

    def run(x0):
        def body(st):
            i, x = st
            row = table[x & ((1 << 18) - 1)]          # [T, 8]
            x = x + row[:, 0] - row[:, 1] + 1
            return i + 1, x
        return jax.lax.while_loop(lambda st: st[0] < iters, body,
                                  (jnp.int32(0), x0))[1]

    f = jax.jit(run)
    x0 = jnp.arange(lanes, dtype=jnp.int32)
    jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0 + 1))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    quick = "--quick" in sys.argv
    print(f"devices: {jax.devices()}", file=sys.stderr)

    for T in ([4096] if quick else [1024, 2048, 4096, 8192, 16384]):
        us = tick_floor(T) * 1e6
        print(f"tick_floor lanes={T:6d}: {us:8.1f} us/iter "
              f"({T / us:.1f} lane/us)")

    from bwa_mem_scale_tpu.config import MemOptions
    from bwa_mem_scale_tpu.models.aligner import (build_demo_aligner,
                                                  simulate_reads)
    from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl
    from bwa_mem_scale_tpu.pipeline.align import PipelineConfig

    opt = MemOptions()
    al = build_demo_aligner(genome_bp=4_600_000, opt=opt,
                            cfg=PipelineConfig())
    fmi = al.fmi
    L = 101

    cfgs = [(4096, None), (4096, 2048), (4096, 1024),
            (8192, 4096), (8192, 2048), (16384, 4096),
            (16384, 8192)]
    if quick:
        cfgs = [(4096, None), (4096, 2048), (8192, 4096)]
    for B, lanes in cfgs:
        codes, lens = simulate_reads(al.idx.bns, B, L, seed=42,
                                     err_rate=0.01)
        codes = jnp.asarray(np.asarray(codes, np.int32))
        lens = jnp.asarray(np.asarray(lens, np.int32))

        def run(codes, lens):
            bufs = collect_smems_rl(
                fmi, codes, lens, min_seed_len=opt.min_seed_len,
                split_len=opt.split_len, split_width=opt.split_width,
                max_mem_intv=opt.max_mem_intv, max_out=L,
                lanes=lanes)
            return bufs.cnt.sum() + bufs.k.sum()

        f = jax.jit(run)
        jax.block_until_ready(f(codes, lens))
        t0 = time.perf_counter()
        jax.block_until_ready(f(codes, lens))
        dt = time.perf_counter() - t0
        print(f"seed B={B:6d} lanes={lanes or B:6d}: {dt:7.3f}s "
              f"({B / dt:9,.0f} reads/s)")


if __name__ == "__main__":
    main()
