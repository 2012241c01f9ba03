"""Chip A/B for the k-step seeding machine: times the full 3-pass
collect (collect_smems_rl) at K in {1, 2, 3} x a worker-lane grid on
the bench workload, plus the position-parallel sweep for reference.

Run on the TPU (axon) when the tunnel is up:
    python tools/probe_kstep.py [--quick]

CPU-measured busy-lane-tick baseline (ROUND2.md): 1-step 54,091;
K=2 + backward pairing 28,797; K=3 + triple tail 21,905 — wall-clock
should track ticks if the wider rows (160/672 B) stay latency-bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

sys.argv = [a for a in sys.argv if a != "--quick"] or sys.argv
QUICK = "--quick" in sys.argv


def main():
    import dataclasses
    import bench
    from bwa_mem_scale_tpu.models.aligner import simulate_reads
    from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl
    from bwa_mem_scale_tpu.ops.smem import collect_smems_device
    from bwa_mem_scale_tpu.index.kstep import (build_cp2, save_cp2,
                                               load_cp2)
    from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex

    print(f"devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    idx = al.idx
    fmis = {1: dataclasses.replace(al.fmi, cp2_fused=None,
                                   count2=None, count3=None)}
    prefix = bench.CACHE[: -len(".tpuidx.npz")]
    for K in (2, 3):
        p = f"{prefix}.cp{K}.npz"
        t = load_cp2(p) if os.path.exists(p) else None
        if t is None:
            t = build_cp2(idx, K=K)
            save_cp2(t, prefix)
        fmis[K] = DeviceFMIndex.from_host(idx, cp2=t)

    B, L = bench.BATCH, bench.READ_LEN
    kw = dict(min_seed_len=19, split_len=28, split_width=10,
              max_mem_intv=20, max_out=L)
    batches = [simulate_reads(idx.bns, B, L, seed=900 + i,
                              err_rate=0.01) for i in range(3)]
    batches = [(np.asarray(c, np.int32), np.asarray(ln, np.int32))
               for c, ln in batches]

    lane_grid = [None] if QUICK else [None, B // 2, 3 * B // 4]
    for K in (1, 2, 3):
        for lanes in lane_grid:
            f = fmis[K]
            # warm (new shapes pay remote compiles)
            out = collect_smems_rl(f, *batches[0], lanes=lanes, **kw)
            jax.block_until_ready(out.cnt)
            t0 = time.perf_counter()
            for c, ln in batches[1:]:
                out = collect_smems_rl(f, c, ln, lanes=lanes, **kw)
                jax.block_until_ready(out.cnt)
            dt = (time.perf_counter() - t0) / (len(batches) - 1)
            print(f"K={K} lanes={lanes or B}: {dt * 1e3:8.1f} ms/batch "
                  f"({B / dt:,.0f} reads/s seeding)")
    # sweep engine reference point (uses the k-step body at K>=2)
    for K in (1, 2):
        f = fmis[K]
        out = collect_smems_device(f, *batches[0], **kw)
        jax.block_until_ready(out.cnt)
        t0 = time.perf_counter()
        for c, ln in batches[1:]:
            out = collect_smems_device(f, c, ln, **kw)
            jax.block_until_ready(out.cnt)
        dt = (time.perf_counter() - t0) / (len(batches) - 1)
        print(f"sweep K={K}: {dt * 1e3:8.1f} ms/batch")


if __name__ == "__main__":
    main()
