"""Tunnel behavior with a REAL busy program (the readlane seeder,
~0.7 s on chip): do uploads/dispatches/fetches block behind it?

Run on chip:  python tools/probe_tunnel2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.models.aligner import simulate_reads
from bwa_mem_scale_tpu.ops.smem_rl import collect_smems_rl


def t(f):
    t0 = time.perf_counter()
    r = f()
    return time.perf_counter() - t0, r


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    fmi = al.fmi
    opt = MemOptions()
    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              max_mem_intv=opt.max_mem_intv, max_out=bench.READ_LEN)

    seeder = jax.jit(lambda f, c, l: collect_smems_rl(f, c, l, **kw).cnt)
    batches = [simulate_reads(al.idx.bns, bench.BATCH, bench.READ_LEN,
                              seed=300 + i, err_rate=0.01)
               for i in range(6)]
    batches = [(jnp.asarray(np.asarray(c, np.int32)),
                jnp.asarray(np.asarray(l, np.int32)))
               for c, l in batches]
    c0, l0 = batches[0]
    np.asarray(seeder(fmi, c0, l0).sum())     # compile
    dt, h = t(lambda: seeder(fmi, *batches[1]))
    t0 = time.perf_counter()
    np.asarray(h.sum())
    print(f"seeder: dispatch {dt:.3f} s, run {time.perf_counter()-t0:.3f} s")

    host = np.random.randint(0, 5, (4096, 128)).astype(np.int32)  # 2 MB
    ready = jnp.asarray(np.arange(256 * 1024, dtype=np.int32)) * 2  # 1 MB
    np.asarray(ready[:4])

    # upload while seeder busy
    _, h = t(lambda: seeder(fmi, *batches[2]))
    dt, dev = t(lambda: jnp.asarray(host))
    print(f"2 MB upload (seeder busy):   {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(ready))
    print(f"1 MB ready-fetch (busy):     {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(h.sum()))
    print(f"drain seeder:                {dt*1e3:8.1f} ms")

    # dispatch small jit while busy, then fetch its result
    small = jax.jit(lambda a: a.sum())
    np.asarray(small(ready))
    _, h = t(lambda: seeder(fmi, *batches[3]))
    dt, r2 = t(lambda: small(dev))
    print(f"small dispatch (busy):       {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(r2))
    print(f"fetch small result (FIFO?):  {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(h.sum()))
    print(f"drain seeder:                {dt*1e3:8.1f} ms")

    # np.zeros->jnp.asarray->jit-call chain while busy (the cigar path)
    _, h = t(lambda: seeder(fmi, *batches[4]))
    def cigar_like():
        qs = np.zeros((1024, 128), np.int32)
        a = jnp.asarray(qs)
        b = jnp.asarray(qs)
        return small(a) + small(b)
    dt, r3 = t(cigar_like)
    print(f"cigar-like upload+2 jit (busy): {dt*1e3:6.1f} ms")
    dt, _ = t(lambda: np.asarray(r3))
    print(f"fetch its result:            {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(h.sum()))
    print(f"drain seeder:                {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
