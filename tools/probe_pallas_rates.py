"""Measure the primitive rates that decide the Pallas seeding-kernel
design (round 3):

  A. VMEM capacity: largest scratch allocation that compiles+runs
     (decides which genomes' checkpoint tables can live in VMEM).
  B. In-kernel scalar-indexed sublane load rate from a VMEM table
     (chained across ticks, the occ-fetch candidate).
  C. In-kernel per-row lane gather (jnp.take_along_axis axis=-1 ->
     tpu.dynamic_gather) — needed to extract the 8-lane group from a
     128-lane packed row.
  D. VMEM->SMEM transfer of a per-tick address vector (vector domain
     -> scalar domain handoff).
  E. HBM row DMA rate at pipeline depth D (big-genome fallback).
  F. XLA gather rate vs lane count and table size (the current
     machine's primitive; is it serial per row?).

Run: python tools/probe_pallas_rates.py [which]   e.g. "ABF"
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WHICH = set((sys.argv[1] if len(sys.argv) > 1 else "ABCDEF").upper())


def _sync(out):
    """np.asarray fetch — block_until_ready does NOT reliably sync
    on the axon tunnel (a small value fetch is the only real sync)."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.tree_util.tree_leaves(leaf)[0]).ravel()[:1]
    return out


def bench(fn, arg_variants, reps=3):
    """arg_variants: list of arg tuples, one per rep — the axon
    tunnel serves identical input buffers from a value cache, so
    every timing rep must use different inputs."""
    _sync(fn(*arg_variants[0]))
    t0 = time.time()
    for r in range(reps):
        _sync(fn(*arg_variants[1 + (r % (len(arg_variants) - 1))]))
    return (time.time() - t0) / reps


def probe_A():
    print("--- A: VMEM capacity ---", flush=True)
    for mb in (1, 4, 8, 16, 24, 32, 48, 64, 96, 112, 128):
        n = mb * (1 << 20) // 4 // 128

        def kernel(x_ref, o_ref, scratch):
            scratch[0:1, :] = x_ref[0:1, :]
            o_ref[0:1, :] = (scratch[n - 1:n, :] + scratch[0:1, :])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.int32)],
            )(jnp.ones((1, 128), jnp.int32))
            jax.block_until_ready(out)
            print(f"  {mb:4d} MB scratch: OK", flush=True)
        except Exception as e:
            print(f"  {mb:4d} MB scratch: FAIL ({type(e).__name__}: "
                  f"{str(e)[:300]})", flush=True)
            break


def probe_B():
    print("--- B: VMEM scalar-indexed sublane load rate ---", flush=True)
    # Table [NB, 128] int32; T lanes; NT chained ticks. Each tick:
    # scalar loop loads T rows into scratch, vector step derives the
    # next T indices from the gathered data (dependence chain).
    # NB=8192 -> 4 MB table (VMEM is ~16 MB total on this chip;
    # a 16 MB table input fails remote compile)
    for NB, T, NT in ((1 << 13, 1024, 32), (1 << 13, 4096, 32)):
        def kernel(tab_ref, idx0_ref, o_ref, rows, nxt_v, idx_smem,
                   sem):
            # DMA initial indices (VMEM input) into SMEM scratch
            dma0 = pltpu.make_async_copy(idx0_ref, idx_smem, sem)
            dma0.start()
            dma0.wait()

            def tick(t, carry):
                def load(i, _):
                    rows[i, :] = tab_ref[idx_smem[i], :]
                    return 0
                jax.lax.fori_loop(0, T, load, 0)
                # vector step: next idx = f(row sums) mod NB, then
                # DMA the vector into SMEM for the next tick's loads
                nxt_v[:] = (jnp.sum(rows[:, :8], axis=1) * 1103515245
                            ) % NB
                dma = pltpu.make_async_copy(nxt_v, idx_smem, sem)
                dma.start()
                dma.wait()
                return carry

            jax.lax.fori_loop(0, NT, tick, 0)
            o_ref[0, :] = rows[0, :]

        tab = jnp.arange(NB * 128, dtype=jnp.int32).reshape(NB, 128)
        try:
            f = jax.jit(lambda t_, i_: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((T, 128), jnp.int32),
                                pltpu.VMEM((T,), jnp.int32),
                                pltpu.SMEM((T,), jnp.int32),
                                pltpu.SemaphoreType.DMA(())],
            )(t_, i_))
            variants = [(tab, jnp.asarray(
                ((np.arange(T) * 9973 + r * 131) % NB
                 ).astype(np.int32))) for r in range(5)]
            dt = bench(f, variants)
            rate = NB and (dt / (NT * T) * 1e9)
            print(f"  NB={NB} T={T}: {rate:7.1f} ns/row  "
                  f"({dt*1e3:.2f} ms / {NT} ticks)", flush=True)
        except Exception as e:
            print(f"  NB={NB} T={T}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def probe_C():
    print("--- C: in-kernel per-row lane gather (axis=-1) ---",
          flush=True)

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=-1)

    T = 1024
    x = jnp.arange(T * 128, dtype=jnp.int32).reshape(T, 128)
    idx = jnp.asarray((np.arange(T * 128) * 7 % 128
                       ).astype(np.int32).reshape(T, 128))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), -1)
        np.testing.assert_array_equal(np.asarray(out), want)
        print("  take_along_axis(axis=-1): OK", flush=True)
    except Exception as e:
        print(f"  take_along_axis(axis=-1): FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def probe_D():
    print("--- D: VMEM->SMEM address handoff ---", flush=True)
    T = 4096

    def kernel(v_ref, o_ref, idx_smem, sem):
        dma = pltpu.make_async_copy(v_ref, idx_smem, sem)
        dma.start()
        dma.wait()
        o_ref[0, 0] = idx_smem[17]

    v = jnp.arange(T, dtype=jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((T,), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )(v)
        assert int(np.asarray(out)[0, 0]) == 17, out
        print("  VMEM->SMEM DMA: OK", flush=True)
    except Exception as e:
        print(f"  VMEM->SMEM DMA: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def probe_E():
    print("--- E: HBM row-DMA rate, pipeline depth D ---", flush=True)
    NB, W = 1 << 20, 128           # 512 MB table in HBM
    T, NT = 1024, 8
    for D in (4, 16, 64):
        def kernel(idx_ref, tab_hbm, o_ref, rows, sems):
            def tick(t, c):
                def issue(i, _):
                    pltpu.make_async_copy(
                        tab_hbm.at[pl.ds(idx_ref[i], 1), :],
                        rows.at[pl.ds(i, 1), :],
                        sems.at[jax.lax.rem(i, D)]).start()
                    return 0

                def drain(i, _):
                    pltpu.make_async_copy(
                        tab_hbm.at[pl.ds(idx_ref[i], 1), :],
                        rows.at[pl.ds(i, 1), :],
                        sems.at[jax.lax.rem(i, D)]).wait()
                    return 0
                # issue D ahead, then wait in order
                jax.lax.fori_loop(0, D, issue, 0)

                def step(i, _):
                    @pl.when(i + D < T)
                    def _():
                        issue(i + D, 0)
                    drain(i, 0)
                    return 0
                jax.lax.fori_loop(0, T - D, step, 0)

                def tail(i, _):
                    drain(T - D + i, 0)
                    return 0
                jax.lax.fori_loop(0, D, tail, 0)
                return c
            jax.lax.fori_loop(0, NT, tick, 0)
            o_ref[0, :] = rows[0, :]

        tab = jnp.zeros((NB, W), jnp.int32)
        try:
            f = jax.jit(lambda i_, t_: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((T, W), jnp.int32),
                                pltpu.SemaphoreType.DMA((D,))],
            )(i_, t_))
            variants = [(jnp.asarray(
                ((np.arange(T) * 999983 + r * 771) % NB
                 ).astype(np.int32)), tab) for r in range(5)]
            dt = bench(f, variants)
            print(f"  depth={D}: {dt / (NT * T) * 1e9:7.1f} ns/row",
                  flush=True)
        except Exception as e:
            print(f"  depth={D}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def probe_F():
    print("--- F: XLA gather rate (current primitive) ---", flush=True)
    NT = 32
    for NB, W, T in ((1 << 18, 8, 1024), (1 << 18, 8, 4096),
                     (1 << 18, 8, 16384), (1 << 18, 40, 4096),
                     (1 << 22, 8, 4096), (1 << 27, 8, 4096)):
        # non-zero table: a zeros table + value cache + constant
        # folding can fake sub-ns rates
        tabn = (np.arange(NB, dtype=np.int32) % 251)[:, None] * \
            np.ones((1, W), np.int32)
        tab = jnp.asarray(tabn)

        @jax.jit
        def f(tab, idx):
            def tick(t, ix):
                rows = tab[ix]
                return (jnp.sum(rows, axis=1) * 1103515245 + t) % NB
            return jax.lax.fori_loop(0, NT, tick, idx)

        try:
            variants = [(tab, jnp.asarray(
                ((np.arange(T) * 999983 + r * 1237) % NB
                 ).astype(np.int32))) for r in range(5)]
            dt = bench(f, variants)
            print(f"  NB={NB:>10} W={W:>3} T={T:>6}: "
                  f"{dt / (NT * T) * 1e9:7.1f} ns/row "
                  f"({dt / NT * 1e3:6.2f} ms/tick)", flush=True)
        except Exception as e:
            print(f"  NB={NB} W={W} T={T}: FAIL {type(e).__name__}",
                  flush=True)
        del tab


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}",
          flush=True)
    for ch in "ABCDEF":
        if ch in WHICH:
            globals()[f"probe_{ch}"]()
