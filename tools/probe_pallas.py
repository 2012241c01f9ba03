"""Probe: does Pallas lower + execute on this TPU backend (axon)?

VERDICT round-2 item 2 requires this question answered with code.
Three stages, each a superset of the last:
  1. trivial elementwise kernel (does pallas_call lower at all)
  2. dynamic-slice gather from a VMEM-resident table inside a
     fori_loop (the shape of the FM-index occ tick)
  3. HBM-resident table + double-buffered async DMA of checkpoint
     rows (the real occ-gather access pattern at genome scale)

Run: python tools/probe_pallas.py   (prints PROBE_<n>_{OK,FAIL})
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe1():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2 + 1

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2 + 1)


def probe2():
    # table[idx[i]] row gather inside a loop — occ-tick shaped.
    T, W, N = 512, 128, 64

    def kernel(tab_ref, idx_ref, o_ref):
        def body(i, acc):
            row = tab_ref[idx_ref[i, 0], :]
            return acc + row
        acc = jax.lax.fori_loop(0, N, body,
                                jnp.zeros((W,), jnp.int32))
        o_ref[0, :] = acc

    tab = jnp.arange(T * W, dtype=jnp.int32).reshape(T, W) % 97
    idx = jnp.arange(N, dtype=jnp.int32).reshape(N, 1) * 7 % T
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    want = np.asarray(tab)[np.asarray(idx)[:, 0]].sum(0)
    np.testing.assert_array_equal(np.asarray(out)[0], want)


def probe3():
    # HBM-resident table, async-DMA one row at a time into VMEM
    # scratch (double buffered) — the genome-scale occ pattern.
    T, W, N = 4096, 128, 32

    def kernel(idx_ref, tab_hbm, o_ref):
        def body(scratch, sem):
            def get(slot, i):
                return pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(idx_ref[i, 0], 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sem.at[slot])
            get(0, 0).start()

            def loop(i, acc):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < N)
                def _():
                    get(nxt, i + 1).start()
                get(slot, i).wait()
                return acc + scratch[slot, :]

            acc = jax.lax.fori_loop(0, N, loop,
                                    jnp.zeros((W,), jnp.int32))
            o_ref[0, :] = acc

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((2, W), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA((2,)))

    tab = jnp.arange(T * W, dtype=jnp.int32).reshape(T, W) % 89
    idx = (jnp.arange(N, dtype=jnp.int32) * 131 % T).reshape(N, 1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, tab)
    want = np.asarray(tab)[np.asarray(idx)[:, 0]].sum(0)
    np.testing.assert_array_equal(np.asarray(out)[0], want)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}",
          file=sys.stderr)
    ok = True
    for i, fn in enumerate([probe1, probe2, probe3], 1):
        try:
            fn()
            print(f"PROBE_{i}_OK")
        except Exception:
            ok = False
            traceback.print_exc()
            print(f"PROBE_{i}_FAIL")
    sys.exit(0 if ok else 1)
