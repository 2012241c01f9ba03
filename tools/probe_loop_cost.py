"""Separate per-CALL cost (tunnel RTT + arg upload + fetch) from
per-TICK cost (the real on-device loop body) by timing the same
chained body at several tick counts and fitting slope + intercept.

Bodies:
  gather   — one fused [2T]-row gather from a [NB, 8] table (the
             minimal seeding tick)
  scatter  — gather + a [T]-row scatter into [T, L]
  onehot   — gather + a one-hot masked write into [T, L]
  arith    — no memory ops, pure vector arithmetic chain (floor)

Device-resident inputs are uploaded once outside timing; per-rep
index variation defeats the axon value cache.

Run: python tools/probe_loop_cost.py [T]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 101
NB = 1 << 18
NTS = (8, 32, 128, 512)


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def fit(name, make_fn):
    pts = []
    for nt in NTS:
        f = make_fn(nt)
        variants = [jnp.asarray(((np.arange(T) * 9973 + 131 * r) % NB
                                 ).astype(np.int32)) for r in range(5)]
        _sync(f(variants[0]))          # compile
        reps = 3
        t0 = time.time()
        for r in range(reps):
            _sync(f(variants[1 + r % 4]))
        dt = (time.time() - t0) / reps
        pts.append((nt, dt))
    x = np.array([p[0] for p in pts], float)
    y = np.array([p[1] for p in pts], float)
    slope, intercept = np.polyfit(x, y, 1)
    print(f"{name:10s} per-tick {slope*1e6:8.2f} us   "
          f"per-call {intercept*1e3:7.2f} ms   "
          f"({', '.join(f'{n}:{d*1e3:.1f}ms' for n, d in pts)})",
          flush=True)


def main():
    tab = jnp.asarray((np.arange(NB, dtype=np.int32) % 251)[:, None]
                      * np.ones((1, 8), np.int32))
    stk0 = jnp.zeros((T, L), jnp.int32)
    tidx = jnp.arange(T)
    iota = jnp.arange(L, dtype=jnp.int32)[None, :]

    def mk_gather(nt):
        @jax.jit
        def f(i0):
            def tick(t, ix):
                pp = jnp.concatenate([ix, (ix + 7) % NB])
                rows = tab[pp]
                nx = (jnp.sum(rows[:T], 1) + jnp.sum(rows[T:], 1)
                      + t) % NB
                return nx
            return jax.lax.fori_loop(0, nt, tick, i0)
        return f

    def mk_scatter(nt):
        @jax.jit
        def f(i0):
            def tick(t, c):
                ix, stk = c
                rows = tab[ix]
                v = jnp.sum(rows, 1)
                stk = stk.at[tidx, ix % L].set(v)
                return ((v + t) % NB, stk)
            return jax.lax.fori_loop(0, nt, tick, (i0, stk0))
        return f

    def mk_onehot(nt):
        @jax.jit
        def f(i0):
            def tick(t, c):
                ix, stk = c
                rows = tab[ix]
                v = jnp.sum(rows, 1)
                stk = jnp.where(iota == (ix % L)[:, None],
                                v[:, None], stk)
                return ((v + t) % NB, stk)
            return jax.lax.fori_loop(0, nt, tick, (i0, stk0))
        return f

    def mk_arith(nt):
        @jax.jit
        def f(i0):
            def tick(t, ix):
                return (ix * 1103515245 + t) % NB
            return jax.lax.fori_loop(0, nt, tick, i0)
        return f

    fit("arith", mk_arith)
    fit("gather", mk_gather)
    fit("scatter", mk_scatter)
    fit("onehot", mk_onehot)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  T={T}", flush=True)
    main()
