"""Standalone timing of the kswg cigar-DP program at production shape.

Run on chip:  python tools/probe_kswg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops import kswg


def main():
    opt = MemOptions()
    rng = np.random.RandomState(0)
    P, QL, TL = 1024, 128, 128
    qs = rng.randint(0, 4, (P, QL)).astype(np.int32)
    ts = qs.copy()
    # sprinkle mismatches/indel-ish noise
    ts[rng.rand(P, TL) < 0.03] = rng.randint(0, 4)
    qlens = np.full(P, 101, np.int32)
    tlens = np.full(P, 101, np.int32)
    ws = np.full(P, 8, np.int32)

    def call():
        return kswg.ksw_global_batch(
            jnp.asarray(qs), jnp.asarray(qlens), jnp.asarray(ts),
            jnp.asarray(tlens), jnp.asarray(ws),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.mat)

    t0 = time.perf_counter()
    res = call()
    t_first = time.perf_counter() - t0
    np.asarray(res.score)
    print(f"first call+compile: {t_first:.3f} s")

    for i in range(3):
        t0 = time.perf_counter()
        res = call()
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(res.score.sum())
        t_wait = time.perf_counter() - t0
        t0 = time.perf_counter()
        ops = np.asarray(res.ops)
        t_ops = time.perf_counter() - t0
        print(f"warm call {i}: dispatch {t_disp:.3f} s, "
              f"wait {t_wait:.3f} s, ops fetch {t_ops:.3f} s")

    # vary ws (wider bands like retry rounds)
    ws2 = np.full(P, 100, np.int32)
    res = kswg.ksw_global_batch(
        jnp.asarray(qs), jnp.asarray(qlens), jnp.asarray(ts),
        jnp.asarray(tlens), jnp.asarray(ws2),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.mat)
    t0 = time.perf_counter()
    np.asarray(res.score.sum())
    print(f"w=100 wait: {time.perf_counter() - t0:.3f} s")


if __name__ == "__main__":
    main()
