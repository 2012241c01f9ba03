"""Cost model of the dependent checkpoint-row gather — the seeding
machine's irreducible per-tick op (occ_all4_pair: one [2N]-row gather
of 32 B rows from the [nb, 8] int32 fused table).

Measures time per gather in a DEPENDENT chain (each iteration's
indices derive from the previous fetch, like the FM walk) over a grid
of (rows-per-gather N, row width W, table rows NB), plus variants:
sorted indices, int8 table, flat 1-D table, two half-width gathers.

Run on the real chip:  python tools/probe_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bwa_mem_scale_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PROBE_ITERS", 64))


def time_chain(table, N, iters=ITERS, sort=False, reps=3):
    """Dependent chain: idx -> gather row -> mix -> next idx."""
    NB = table.shape[0]

    @jax.jit
    def run(idx0):
        def body(i, idx):
            ix = jnp.sort(idx) if sort else idx
            rows = table[ix]                      # [N, W]
            h = jnp.sum(rows.astype(jnp.int32), axis=-1)
            nxt = (idx * jnp.int32(1103515245) + h
                   + jnp.int32(12345)) % jnp.int32(NB)
            return jnp.abs(nxt).astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, idx0)

    idx0 = jnp.asarray(np.random.randint(0, NB, N, dtype=np.int32))
    run(idx0).block_until_ready()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run(idx0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    bw = N * table.shape[1] * table.dtype.itemsize / per / 1e9
    return per, bw


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # --- grid: rows-per-gather x row width, E. coli-size table ---
    NB = 1 << 18                                  # 256k rows
    print("\n== width/N grid (table 256k rows, int32, random idx) ==")
    for W in (8, 16, 32, 64):
        tbl = jnp.asarray(rng.integers(0, 2**31, (NB, W)).astype(np.int32))
        for N in (4096, 16384, 65536):
            per, bw = time_chain(tbl, N)
            print(f"W={W:3d} ({W*4:4d}B) N={N:6d}: {per*1e6:8.1f} us/gather"
                  f"  {bw:7.2f} GB/s  {per/N*1e9:6.1f} ns/row")

    # --- table size sweep at W=8, N=8192 (the machine's shape) ---
    print("\n== table-size sweep (W=8 int32, N=8192) ==")
    for nb_log in (12, 14, 16, 18, 20, 22, 24):
        nb = 1 << nb_log
        tbl = jnp.asarray(rng.integers(0, 2**31, (nb, 8)).astype(np.int32))
        per, bw = time_chain(tbl, 8192)
        print(f"NB=2^{nb_log:2d} ({nb*32/1e6:8.1f} MB): {per*1e6:8.1f} us"
              f"  {bw:7.2f} GB/s  {per/8192*1e9:6.1f} ns/row")

    # --- variants at the machine's exact shape ---
    NB = 144_000   # E. coli fused table rows
    print(f"\n== variants (table {NB} rows x 8 int32, N=8192) ==")
    tbl = jnp.asarray(rng.integers(0, 2**31, (NB, 8)).astype(np.int32))
    per, bw = time_chain(tbl, 8192)
    print(f"baseline         : {per*1e6:8.1f} us  {bw:7.2f} GB/s")
    per, bw = time_chain(tbl, 8192, sort=True)
    print(f"sorted idx       : {per*1e6:8.1f} us  {bw:7.2f} GB/s")
    tbl8 = jnp.asarray(rng.integers(0, 127, (NB, 32)).astype(np.int8))
    per, bw = time_chain(tbl8, 8192)
    print(f"int8 rows (32B)  : {per*1e6:8.1f} us  {bw:7.2f} GB/s")
    # flat gather: 8 scalar elements per lane via flat [NB*8] table
    flat = jnp.asarray(rng.integers(0, 2**31, NB * 8).astype(np.int32))

    @jax.jit
    def run_flat(idx0):
        def body(i, idx):
            base = idx * 8
            cols = jnp.stack([flat[base + j] for j in range(8)], -1)
            h = jnp.sum(cols.astype(jnp.int32), axis=-1)
            nxt = (idx * jnp.int32(1103515245) + h
                   + jnp.int32(12345)) % jnp.int32(NB)
            return jnp.abs(nxt).astype(jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, idx0)

    idx0 = jnp.asarray(np.random.randint(0, NB, 8192, dtype=np.int32))
    run_flat(idx0).block_until_ready()
    t0 = time.perf_counter()
    run_flat(idx0).block_until_ready()
    per = (time.perf_counter() - t0) / ITERS
    print(f"flat 8x1 gathers : {per*1e6:8.1f} us  "
          f"{8192*32/per/1e9:7.2f} GB/s")


if __name__ == "__main__":
    main()
