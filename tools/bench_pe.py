"""Paired-end throughput on one chip (bench.py's PE counterpart).

Simulates proper pairs (insert ~ N(350, 50)), runs the pipelined PE
stages exactly like the driver loop, reports reads/s.

Run on chip:  python tools/bench_pe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from bwa_mem_scale_tpu.utils.profiling import PROFILER

BATCH = bench.BATCH            # reads per device batch (pairs = B/2)
N_BATCHES = int(os.environ.get("BENCH_N_BATCHES", 6))
READ_LEN = bench.READ_LEN


def simulate_pairs(bns, n_pairs, L, seed, err_rate=0.01,
                   isize_mean=350, isize_sd=50):
    rng = np.random.RandomState(seed)
    g = bns.seq
    G = len(g)
    codes = np.empty((2 * n_pairs, L), dtype=np.int32)
    for p in range(n_pairs):
        isize = max(int(rng.normal(isize_mean, isize_sd)), L + 10)
        pos = rng.randint(0, G - isize)
        r1 = g[pos: pos + L].astype(np.int32)
        r2 = g[pos + isize - L: pos + isize].astype(np.int32)
        r2 = 3 - r2[::-1]          # reverse-complement mate
        for r in (r1, r2):
            m = rng.rand(L) < err_rate
            r[m] = rng.randint(0, 4, int(m.sum()))
        codes[2 * p] = r1
        codes[2 * p + 1] = r2
    lens = np.full(2 * n_pairs, L, dtype=np.int32)
    return codes, lens


def main():
    import jax
    print(f"* devices: {jax.devices()}", file=sys.stderr)
    al = bench.get_aligner()
    batches = [simulate_pairs(al.idx.bns, BATCH // 2, READ_LEN,
                              seed=500 + i)
               for i in range(N_BATCHES)]

    # warmup / compile
    t0 = time.time()
    recs, mates = al.align_pairs_and_finalize(*batches[0])
    print(f"* warmup (compile) {time.time() - t0:.1f}s", file=sys.stderr)
    n_mapped = sum(1 for r in recs if r and r[0].rid >= 0)
    print(f"* warmup mapped {n_mapped}/{BATCH}", file=sys.stderr)

    # finished SAM text per read (native compose, mate columns +
    # TLEN) — the production deliverable, like bench.py's SE stream
    from bwa_mem_scale_tpu.pipeline import native_finalize
    SAM = native_finalize.available()

    def ctx(first_id):
        if not SAM:
            return None
        return dict(names=[b"p%d" % (first_id + k)
                           for k in range(BATCH)],
                    quals=None, rg_id=None)

    PROFILER.totals.clear()
    PROFILER.counts.clear()
    t0 = time.time()
    pending = None
    done = 0
    sam_bytes = 0
    for i, (codes, lens) in enumerate(batches):
        if pending is not None:
            fetched = al.fetch_pairs(pending)
        ph = al.dispatch_pairs(codes, lens)
        if pending is not None:
            r, m = al.pe_post(fetched, 0, sam_ctx=ctx(done))
            done += len(r)
            if SAM:
                sam_bytes += sum(len(x) for x in r)
        pending = ph
    r, m = al.pe_post(al.fetch_pairs(pending), 0, sam_ctx=ctx(done))
    done += len(r)
    if SAM:
        sam_bytes += sum(len(x) for x in r)
    dt = time.time() - t0
    assert done == N_BATCHES * BATCH
    rps = done / dt
    print(f"* PE end-to-end: {rps:,.0f} reads/s ({dt:.2f}s for {done}"
          + (f", {sam_bytes / 1e6:.1f} MB SAM text" if SAM else "")
          + ")", file=sys.stderr)
    if os.environ.get("BENCH_PROFILE"):
        PROFILER.report()
    import json
    print(json.dumps({
        "metric": "pe_reads_per_sec_chip_ecoli101",
        "value": round(rps, 1), "unit": "reads/s",
        "vs_baseline": round(rps / bench.BWAMEM2_40CORE_EST, 4)}))


if __name__ == "__main__":
    main()
