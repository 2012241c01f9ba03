"""What does the one-hot machine's tick cost actually track?

Runs the REAL pass-1 machine (ops/smem_oh.one_pos_machine_oh,
unstaged, with_ticks) over a (T lanes, SD stack depth) grid and
reports ms/tick. If cost scales with SD, the one-hot stack rewrites
are the bottleneck (HBM write traffic); if with T, per-lane row work;
if flat, per-tick fixed overhead (gather/loop).

Run: python tools/probe_oh_tick.py
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
from bwa_mem_scale_tpu.ops.smem_oh import one_pos_machine_oh
from bwa_mem_scale_tpu.ops.smem import SmemBuf


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi = al.fmi
    opt = al.opt
    L = bench.READ_LEN
    ME = 24

    for T in (2048, 4096, 8192, 16384):
        B = T
        codes, lens = simulate_reads(al.idx.bns, B, L, seed=5,
                                     err_rate=0.01)
        codes = jnp.asarray(np.asarray(codes, np.int32))
        lens = jnp.asarray(np.asarray(lens, np.int32))
        bidx = jnp.arange(B, dtype=jnp.int32)
        zi = jnp.zeros((B,), jnp.int32)
        for SD in (8, 24, 48):
            @jax.jit
            def run(codes, lens):
                out, (tick, done_at, pt) = one_pos_machine_oh(
                    fmi, codes, lens, bidx, zi,
                    jnp.ones((B,), jnp.int32), lens > 0, True,
                    opt.min_seed_len, ME,
                    SmemBuf.empty(B, ME, fmi.pos_dtype),
                    with_ticks=True, stack_depth=SD)
                return out.cnt.sum(), tick

            r = run(codes, lens)
            np.asarray(r[0])
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                r = run(codes, lens)
                np.asarray(r[0])
                best = min(best, time.perf_counter() - t0)
            ticks = int(np.asarray(r[1]))
            print(f"T={T:6d} SD={SD:3d}: {best*1e3:9.1f} ms total, "
                  f"{ticks:4d} ticks, {best/ticks*1e6:7.1f} us/tick",
                  flush=True)


if __name__ == "__main__":
    main()
