"""Standalone timing of the banded-SW extension kernel at production
shape ([max_pairs, ...] lanes, two rounds x left/right).

Run on chip:  python tools/probe_bsw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ops.bsw import banded_swa_batch

PX = int(os.environ.get("PX", 16384))
QL = int(os.environ.get("QL", 101))
TL = int(os.environ.get("TL", 309))   # L + 2w + pad


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    opt = MemOptions()
    rng = np.random.RandomState(0)
    q = rng.randint(0, 4, (PX, QL)).astype(np.int32)
    t = rng.randint(0, 4, (PX, TL)).astype(np.int32)
    t[:, :QL] = q  # mostly-matching prefix like real extensions
    qlens = rng.randint(10, QL, PX).astype(np.int32)
    tlens = rng.randint(20, TL, PX).astype(np.int32)
    h0 = rng.randint(19, 101, PX).astype(np.int32)

    fn = jax.jit(lambda q_, ql, t_, tl, h, w: banded_swa_batch(
        q_, ql, t_, tl, h, w, opt.o_del, opt.e_del, opt.o_ins,
        opt.e_ins, opt.zdrop, opt.mat))

    for name, w in (("w=100", 100), ("w=200 (retry)", 200)):
        r = fn(jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
               jnp.asarray(tlens), jnp.asarray(h0), w)
        np.asarray(r.score.sum())
        reps = 3
        t0 = time.time()
        for i in range(reps):
            hv = jnp.asarray(h0 + i)   # avoid the input value cache
            r = fn(jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
                   jnp.asarray(tlens), hv, w)
            np.asarray(r.score.sum())
        dt = (time.time() - t0) / reps
        print(f"bsw [{PX},{QL}x{TL}] {name:14s} {dt:8.3f} s/call")


if __name__ == "__main__":
    main()
