"""Scatter vs one-hot-select cost on the real chip.

Hypothesis (round 3): the seeding machine's 0.84 ms/tick is NOT the
occ gathers (XLA gathers measure ~2-3 ns/row on this chip) but the
[T, L] stack scatters (`.at[tidx, i].set`), which XLA lowers to a
serial loop on TPU. If a one-hot masked select is 10-100x cheaper,
the machine tick can be rebuilt scatter-free in pure XLA.

Times, per tick, chained NT times (inputs varied per rep for the
axon value cache):
  1. row-scatter  stk.at[arange(T), i].set(v)
  2. one-hot      where(iota_L == i[:, None], v[:, None], stk)
  3. row-gather   stk[arange(T), i]
  4. one-hot gather sum(where(iota_L == i[:, None], stk, 0), axis=1)
  5. emit_rows-style 2D scatter (.at[r, idx].set, mode=drop)
  6. tick-shaped combo: 1 fused occ gather + 3 one-hot pushes
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 101
NT = 50


def _sync(out):
    """np.asarray fetch — block_until_ready does NOT reliably sync
    on the axon tunnel (a small value fetch is the only real sync)."""
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(name, f, variants, per=1):
    _sync(f(*variants[0]))
    t0 = time.time()
    reps = 3
    for r in range(reps):
        _sync(f(*variants[1 + (r % (len(variants) - 1))]))
    dt = (time.time() - t0) / reps / NT / per
    print(f"{name:42s} {dt*1e6:9.2f} us/tick", flush=True)


def chain(body):
    @jax.jit
    def f(stk, i0, v0):
        def tick(t, c):
            stk, i, v = c
            stk = body(stk, i, v)
            i = (i + stk[:, 0] + t) % L
            v = v + 1
            return (stk, i, v)
        return jax.lax.fori_loop(0, NT, tick, (stk, i0, v0))[0]
    return f


def chain_gather(body):
    @jax.jit
    def f(stk, i0):
        def tick(t, c):
            i, acc = c
            g = body(stk, i)
            return ((i + g + t) % L, acc + g)
        return jax.lax.fori_loop(
            0, NT, tick, (i0, jnp.zeros_like(i0)))[1]
    return f


def variants_siv(rng, n=5):
    return [(jnp.asarray(rng.integers(0, 100, (T, L)), jnp.int32),
             jnp.asarray(rng.integers(0, L, T), jnp.int32),
             jnp.asarray(rng.integers(0, 50, T), jnp.int32))
            for _ in range(n)]


def variants_si(rng, n=5):
    return [(jnp.asarray(rng.integers(0, 100, (T, L)), jnp.int32),
             jnp.asarray(rng.integers(0, L, T), jnp.int32))
            for _ in range(n)]


def main():
    rng = np.random.default_rng(0)
    tidx = jnp.arange(T)
    iota = jnp.arange(L, dtype=jnp.int32)[None, :]

    bench("row scatter .at[tidx, i].set",
          chain(lambda stk, i, v: stk.at[tidx, i].set(v)),
          variants_siv(rng))

    bench("one-hot select write",
          chain(lambda stk, i, v: jnp.where(iota == i[:, None],
                                            v[:, None], stk)),
          variants_siv(rng))

    bench("row gather stk[tidx, i]",
          chain_gather(lambda stk, i: stk[tidx, i]),
          variants_si(rng))

    bench("one-hot gather (masked sum)",
          chain_gather(lambda stk, i: jnp.sum(
              jnp.where(iota == i[:, None], stk, 0), axis=1)),
          variants_si(rng))

    # take_along_axis formulation of the row gather
    bench("take_along_axis row gather",
          chain_gather(lambda stk, i: jnp.take_along_axis(
              stk, i[:, None], axis=1)[:, 0]),
          variants_si(rng))

    # 3-entry push (the push3 shape): [T, 3] indices in one scatter
    def push3_scatter(stk, i, v):
        idx = jnp.stack([i, i + 1, i + 2], axis=-1) % L
        vals = jnp.stack([v, v + 1, v + 2], axis=-1)
        return stk.at[tidx[:, None], idx].set(vals, mode="drop")
    bench("push3 scatter [T,3]", chain(push3_scatter),
          variants_siv(rng))

    def push3_onehot(stk, i, v):
        for d in range(3):
            stk = jnp.where(iota == ((i + d) % L)[:, None],
                            (v + d)[:, None], stk)
        return stk
    bench("push3 one-hot x3", chain(push3_onehot), variants_siv(rng))

    # 0/1-entry masked push (mode=drop emulation): one-hot with an
    # out-of-range index writes nothing
    def push_drop_onehot(stk, i, v):
        i2 = jnp.where(v % 3 == 0, i, L)      # ~1/3 push
        return jnp.where(iota == i2[:, None], v[:, None], stk)
    bench("masked push one-hot", chain(push_drop_onehot),
          variants_siv(rng))


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  T={T} L={L}", flush=True)
    main()
