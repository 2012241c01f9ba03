"""Split the seeding stage's device time: pass-1 / pass-2 / pass-3
machines, and a gather-only synthetic floor at the same tick/width
schedule. Chip probe — drives round-5's bandwidth restructure.

Timing discipline per the round-3 axon notes: np.asarray fetch is the
only real sync; vary inputs per rep; slope over reps not single calls.
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
from bwa_mem_scale_tpu.ops.smem_oh import (one_pos_machine_oh,
                                           seed_strategy_machine_oh,
                                           collect_smems_oh)
from bwa_mem_scale_tpu.ops.smem import SmemBuf

REPS = int(os.environ.get("BENCH_REPS", 3))


def timeit(name, fn, args_list):
    # compile + warm
    r = fn(*args_list[0])
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.time()
    for a in args_list[1:]:
        r = fn(*a)
        jax.tree_util.tree_map(lambda x: np.asarray(x), r)
    dt = (time.time() - t0) / (len(args_list) - 1)
    print(f"{name:34s} {dt*1e3:8.1f} ms/batch", file=sys.stderr)
    return dt


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi = al.fmi
    opt = al.opt
    B, L = bench.BATCH, bench.READ_LEN
    seed0 = int(time.time()) % 100000
    batches = [simulate_reads(al.idx.bns, B, L, seed=seed0 + i,
                              err_rate=0.01) for i in range(REPS + 1)]
    batches = [(jnp.asarray(np.asarray(c, np.int32)),
                jnp.asarray(np.asarray(l, np.int32)))
               for c, l in batches]

    bidx = jnp.arange(B, dtype=jnp.int32)
    zi = jnp.zeros((B,), jnp.int32)
    Me = 24
    SD = 24

    @jax.jit
    def p1(c, l):
        out = one_pos_machine_oh(
            fmi, c, l, bidx, zi, jnp.ones((B,), jnp.int32), l > 0,
            True, opt.min_seed_len, Me,
            SmemBuf.empty(B, Me, fmi.pos_dtype), stack_depth=SD)
        return out.cnt.sum() + out.k.sum()

    @jax.jit
    def full(c, l):
        out = collect_smems_oh(
            fmi, c, l, min_seed_len=opt.min_seed_len,
            split_len=opt.split_len, split_width=opt.split_width,
            max_mem_intv=opt.max_mem_intv, max_out=L,
            emit_depth=Me, stack_depth=SD)
        return out.cnt.sum() + out.k.sum()

    @jax.jit
    def p3(c, l):
        out = seed_strategy_machine_oh(
            fmi, c, l, opt.max_mem_intv, opt.min_seed_len + 1, Me)
        return out.cnt.sum() + out.k.sum()

    # gather-only floor: T ticks of one fused 2W-row gather, dependent
    def mk_floor(T, W):
        @jax.jit
        def fl(c):
            pp0 = (c[:W, 0].astype(fmi.pos_dtype) * 7919) % fmi.seq_len

            def body(i, pp):
                from bwa_mem_scale_tpu.ops.occ import occ_all4_pair
                o0, o1 = occ_all4_pair(fmi, pp, pp + 17)
                return (o0[..., 0] + o1[..., 1]) % fmi.seq_len

            return jax.lax.fori_loop(0, T, body, pp0).sum()
        return fl

    t_p1 = timeit("pass-1 machine (staged)", p1,
                  [(c, l) for c, l in batches])
    t_full = timeit("full collect (p1+p2+p3)", full,
                    [(c, l) for c, l in batches])
    t_p3 = timeit("pass-3 machine", p3, [(c, l) for c, l in batches])
    print(f"{'  -> implied pass-2':34s} "
          f"{(t_full - t_p1 - t_p3)*1e3:8.1f} ms/batch",
          file=sys.stderr)

    for T, W in ((587, 4096), (587, 1024), (150, 4096)):
        timeit(f"floor: {T} ticks x {W} lanes x2 rows",
               mk_floor(T, W), [(c,) for c, _ in batches])

    # tick counts with phase split (unstaged machine)
    _, (ticks, done_at, phase_ticks) = one_pos_machine_oh(
        fmi, batches[0][0], batches[0][1], bidx, zi,
        jnp.ones((B,), jnp.int32), batches[0][1] > 0, True,
        opt.min_seed_len, L, SmemBuf.empty(B, L, fmi.pos_dtype),
        with_ticks=True)
    pt = np.asarray(phase_ticks)
    print(f"pass-1 unstaged ticks={int(np.asarray(ticks))} "
          f"phase lane-ticks INIT/FWD/BSCAN/BTAIL/DONE = {pt}",
          file=sys.stderr)
    da = np.asarray(done_at)
    print(f"done_at percentiles: "
          f"{np.percentile(da, [50, 75, 90, 99, 100]).astype(int)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
