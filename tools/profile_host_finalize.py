"""Time the host-side finalization sections for one bench batch.

Run on the real chip (uses the cached bench index):
    python tools/profile_host_finalize.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from bwa_mem_scale_tpu.ref.finalize import (sort_dedup_patch, mark_primary)
from bwa_mem_scale_tpu.pipeline.finalize import BatchFinalizer
from bwa_mem_scale_tpu.models.aligner import simulate_reads


def main():
    al = bench.get_aligner()
    codes, lens = simulate_reads(al.idx.bns, bench.BATCH, bench.READ_LEN,
                                 seed=100, err_rate=0.01)
    codes = np.asarray(codes, np.int32)
    lens = np.asarray(lens, np.int32)

    opt, bns, ref = al.opt, al.idx.bns, al.idx.ref_string
    for rnd in range(2):   # round 0 pays compiles; report round 1
        handle = al.dispatch_batch(codes, lens)
        _, _, pm_dev, out = handle
        np.asarray(out["pair_overflow"])   # sync device work
        t = {}

        t0 = time.perf_counter()
        outs = {k: np.asarray(v) for k, v in out.items()}
        t["fetch extend outputs"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        all_regs = al._regs_from_device(out, codes)
        t["regs_from_device"] = time.perf_counter() - t0

        queries = []
        finalized = []
        t0 = time.perf_counter()
        for i, regs in enumerate(all_regs):
            query = codes[i, : lens[i]].astype(np.uint8)
            queries.append(query)
            regs = sort_dedup_patch(opt, bns, ref, query, regs)
            regs, _ = mark_primary(opt, regs, i)
            finalized.append(regs)
        t["dedup+primary"] = time.perf_counter() - t0

        fin = BatchFinalizer(opt, al.idx)
        t0 = time.perf_counter()
        state = fin.begin_batch(queries, finalized)
        t["begin_batch(jobs+dispatch)"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        recs = fin.complete_batch(state)
        t["complete_batch(fetch+NM/MD+recs)"] = time.perf_counter() - t0

        n_regs = sum(len(r) for r in finalized)
        print(f"round {rnd}: batch {bench.BATCH} reads, "
              f"{n_regs} final regions")
        for k, v in t.items():
            print(f"  {k:34s} {v:7.3f} s")
        print(f"  TOTAL host                         "
              f"{sum(t.values()):7.3f} s")

    # EMF perfect-record path (stream mode resolves ~1/3 of reads here)
    if al.emf is not None:
        from bwa_mem_scale_tpu.index.perfect import emf_lookup_host
        from bwa_mem_scale_tpu.pipeline.perfect import perfect_sam_records
        from bwa_mem_scale_tpu.ops.emf import FW_MATCHED, RC_MATCHED
        t0 = time.perf_counter()
        pm = emf_lookup_host(al.emf, ref, codes, lens)
        t_probe = time.perf_counter() - t0
        is_pm = (pm["code"] == FW_MATCHED) | (pm["code"] == RC_MATCHED)
        t0 = time.perf_counter()
        cnt = 0
        for i in np.flatnonzero(is_pm):
            read = codes[i, : lens[i]].astype(np.uint8)
            perfect_sam_records(opt, bns, al.emf, ref, read,
                                int(pm["code"][i]), int(pm["slot"][i]))
            cnt += 1
        t_rec = time.perf_counter() - t0
        print(f"  emf_lookup_host                    {t_probe:7.3f} s")
        print(f"  perfect_sam_records x{cnt:5d}        {t_rec:7.3f} s")


if __name__ == "__main__":
    main()
