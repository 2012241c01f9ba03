"""Anatomy of the seeding-machine tick cost on the real chip.

Times synthetic while_loops whose bodies contain increasing subsets of
the one_pos_machine tick (ops/smem_rl.py): pure dependent backward_ext,
merged vs split occ gathers, stack push layouts, the round-epilogue
stack copy. Drives optimization decisions with measured numbers.

Run: python tools/probe_tick.py [T] [NTICK]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bwa_mem_scale_tpu.ops.occ import backward_ext_all4, occ_all4

WHICH = set((sys.argv[1] if len(sys.argv) > 1 else "1234567").strip())
T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
NT = int(sys.argv[3]) if len(sys.argv) > 3 else 100
L = 101


def timeit(name, fn, *args):
    def _sync(r):
        # np.asarray fetch: block_until_ready does NOT reliably sync
        # on the axon tunnel
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    _sync(fn(*args))
    tc = time.time() - t0
    t0 = time.time()
    _sync(fn(*args))
    dt = time.time() - t0
    print(f"{name:44s} {dt/NT*1e3:7.3f} ms/tick  "
          f"(compile+run1 {tc:.1f}s)", flush=True)
    return dt


def main():
    from bwa_mem_scale_tpu.index.artifacts import load_index
    from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
    idx = load_index(bench.CACHE)
    fmi = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, fmi.seq_len - 1000, T), fmi.count.dtype)
    s0 = jnp.full((T,), 500, fmi.count.dtype)
    a0 = jnp.asarray(rng.integers(0, 4, T), jnp.int32)

    def loop(body):
        def run(k, s, a):
            def b(c, st):
                return c + 1, body(st)
            init = dict(k=k, l=k, s=s, a=a,
                        stk=dict(k=jnp.zeros((T, L), jnp.int32),
                                 l=jnp.zeros((T, L), jnp.int32),
                                 s=jnp.zeros((T, L), jnp.int32),
                                 n=jnp.zeros((T, L), jnp.int32)),
                        flat=jnp.zeros((T, L * 4), jnp.int32),
                        cnt=jnp.zeros((T,), jnp.int32))
            c, st = jax.lax.while_loop(
                lambda cs: cs[0] < NT,
                lambda cs: b(*cs), (jnp.int32(0), init))
            return st["k"], st["cnt"]
        return jax.jit(run)

    wrap = lambda k: jnp.clip(k, 0, fmi.seq_len - 600)

    # 1. pure dependent backward_ext chain (2 separate occ gathers)
    def b1(st):
        k4, l4, s4 = backward_ext_all4(fmi, st["k"], st["l"], st["s"])
        sel = st["a"][:, None]
        take = lambda v: jnp.take_along_axis(v, sel, axis=-1)[..., 0]
        st2 = dict(st)
        st2["k"] = wrap(take(k4))
        st2["l"] = take(l4)
        st2["s"] = jnp.maximum(take(s4), 1)
        return st2
    timeit("pure ext (2 gathers)", loop(b1), k0, s0, a0)

    # 2. merged occ gather: one [2T] row gather for k and k+s
    def occ_merged(fmi, k, ks):
        both = jnp.concatenate([k, ks])
        from bwa_mem_scale_tpu.index.artifacts import CP_SHIFT, CP_MASK
        block = (both >> CP_SHIFT).astype(jnp.int32)
        y = (both & CP_MASK).astype(jnp.uint32)
        row = fmi.cp_fused[block]
        counts = row[..., :4]
        masks = jax.lax.bitcast_convert_type(row[..., 4:], jnp.uint32)
        top = (~(jnp.uint32(0xFFFFFFFF) >> y)).astype(jnp.uint32)
        pc = jax.lax.population_count(masks & top[..., None])
        occ = counts + pc.astype(counts.dtype)
        return occ[:k.shape[0]], occ[k.shape[0]:]

    def b2(st):
        occ_sp, occ_ep = occ_merged(fmi, st["k"], st["k"] + st["s"])
        k4 = fmi.count[:4] + occ_sp
        s4 = occ_ep - occ_sp
        sel = st["a"][:, None]
        take = lambda v: jnp.take_along_axis(v, sel, axis=-1)[..., 0]
        st2 = dict(st)
        st2["k"] = wrap(take(k4))
        st2["s"] = jnp.maximum(take(s4), 1)
        return st2
    timeit("pure ext (merged 1 gather)", loop(b2), k0, s0, a0)

    # 3. ext + one 4-column stack push (4 scatters)
    tidx = jnp.arange(T)
    def b3(st):
        st2 = b1(st)
        i = jnp.where(st["s"] > 0, st["cnt"] % L, L)
        stk = st["stk"]
        st2["stk"] = dict(
            k=stk["k"].at[tidx, i].set(st2["k"], mode="drop"),
            l=stk["l"].at[tidx, i].set(st2["l"], mode="drop"),
            s=stk["s"].at[tidx, i].set(st2["s"], mode="drop"),
            n=stk["n"].at[tidx, i].set(st["cnt"], mode="drop"))
        st2["cnt"] = st["cnt"] + 1
        return st2
    timeit("ext + 4-col push (4 scatters)", loop(b3), k0, s0, a0)

    # 4. ext + packed push: one scatter of [T,4] into flat [T, L*4]
    def b4(st):
        st2 = b1(st)
        i = jnp.where(st["s"] > 0, (st["cnt"] % L) * 4, L * 4)
        cols = i[:, None] + jnp.arange(4)[None, :]
        vals = jnp.stack([st2["k"], st2["l"], st2["s"], st["cnt"]], axis=-1)
        st2["flat"] = st["flat"].at[tidx[:, None], cols].set(
            vals, mode="drop")
        st2["cnt"] = st["cnt"] + 1
        return st2
    timeit("ext + packed push (1 scatter [T,4])", loop(b4), k0, s0, a0)

    # 5. ext + 4-col stack read (4 gathers)
    def b5(st):
        st2 = b1(st)
        i = st["cnt"] % L
        stk = st["stk"]
        vk = stk["k"][tidx, i]
        vl = stk["l"][tidx, i]
        vs = stk["s"][tidx, i]
        vn = stk["n"][tidx, i]
        st2["cnt"] = st["cnt"] + 1 + (vk + vl + vs + vn) * 0
        return st2
    timeit("ext + 4-col read (4 gathers)", loop(b5), k0, s0, a0)

    # 6. ext + full-stack conditional copy (the round_over tree_map)
    def b6(st):
        st2 = b1(st)
        flag = (st["cnt"] % 7 == 0)[:, None]
        stk = st["stk"]
        st2["stk"] = dict(
            k=jnp.where(flag, stk["l"], stk["k"]),
            l=jnp.where(flag, stk["k"], stk["l"]),
            s=jnp.where(flag, stk["n"], stk["s"]),
            n=jnp.where(flag, stk["s"], stk["n"]))
        st2["cnt"] = st["cnt"] + 1
        return st2
    timeit("ext + full [T,L] stack where-swap x4", loop(b6), k0, s0, a0)

    # 7. ext with NO take_along_axis (test gather-select cost)
    def b7(st):
        k4, l4, s4 = backward_ext_all4(fmi, st["k"], st["l"], st["s"])
        onehot = jax.nn.one_hot(st["a"], 4, dtype=k4.dtype)
        st2 = dict(st)
        st2["k"] = wrap(jnp.sum(k4 * onehot, axis=-1).astype(k4.dtype))
        st2["s"] = jnp.maximum(jnp.sum(s4 * onehot, axis=-1), 1).astype(
            s4.dtype)
        return st2
    timeit("pure ext, one-hot select (no take)", loop(b7), k0, s0, a0)


if __name__ == "__main__":
    main()
