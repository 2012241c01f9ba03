"""Benchmark: single-end alignment throughput on one chip.

Workload ~ BASELINE.json config 1: E. coli-scale genome (4.6 Mbp),
100 bp single-end simulated reads (1% error), full pipeline
(seeding -> chaining -> extension on device; dedup/primary/CIGAR
finalization to SAM records).

Prints ONE JSON line:
  {"metric": ..., "value": reads/sec, "unit": "reads/s",
   "vs_baseline": value / BWAMEM2_40CORE_EST}

Baseline: the reference publishes no absolute reads/s (BASELINE.md);
BWAMEM2_40CORE_EST is our documented estimate of a 40-core bwa-mem2
server on this workload (~330k reads/s for a small cache-resident
index), so vs_baseline > 2.0 corresponds to the north-star
">2x reads/s/chip vs 40-core bwa-mem2".
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BWAMEM2_40CORE_EST = 330_000.0

GENOME_BP = int(os.environ.get("BENCH_GENOME_BP", 4_600_000))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 101))
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
N_BATCHES = int(os.environ.get("BENCH_N_BATCHES", 8))
ERR = 0.01
FMA_K = int(os.environ.get("BENCH_FMA_K", 11))
# readlane: read-per-lane SMEM machine — 2x the position-parallel
# sweep on this chip (see ops/smem_rl.py)
SEED_ENGINE = os.environ.get("BENCH_SEED_ENGINE", "readlane")
# readlane worker lanes (backlog refill); 0/unset = one lane per read
SEED_LANES = int(os.environ.get("BENCH_SEED_LANES", 0)) or None
# k-step checkpoint table: FWD extensions consume K bases per
# dependent gather (index/kstep.py); bit-identical output.
# "0" = off, "1"/"2" = bigram (default), "3" = trigram (chip A/B).
_KS = os.environ.get("BENCH_KSTEP", "2")
KSTEP = _KS != "0"
KSTEP_K = 3 if _KS == "3" else 2
# Prebuilt genome-scale index (BASELINE configs 2+): point
# BENCH_INDEX_PREFIX at e.g. data/chr21s or data/hg38s to bench that
# genome instead of the synthetic E. coli default. EMF/FMA tables are
# used only if present next to the index (building them at bench time
# would dominate the run at these scales).
INDEX_PREFIX = os.environ.get("BENCH_INDEX_PREFIX")
BENCH_TAG = os.environ.get("BENCH_TAG")   # metric-name override

CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench_index.tpuidx.npz" if GENOME_BP == 4_600_000
    else f".bench_index_{GENOME_BP}.tpuidx.npz")


def get_aligner():
    from bwa_mem_scale_tpu.config import MemOptions
    from bwa_mem_scale_tpu.pipeline.align import TpuAligner, PipelineConfig
    from bwa_mem_scale_tpu.index.artifacts import load_index, save_index
    from bwa_mem_scale_tpu.models.aligner import demo_genome
    from bwa_mem_scale_tpu.index.build import build_index
    from bwa_mem_scale_tpu.ops.occ import DeviceFMIndex
    from bwa_mem_scale_tpu.ops.fma import (build_fma_table, save_fma,
                                           load_fma)
    from bwa_mem_scale_tpu.index.perfect import (build_perfect_table,
                                                 save_perfect_table,
                                                 load_perfect_table)

    if INDEX_PREFIX:
        t0 = time.time()
        idx = load_index(INDEX_PREFIX)
        print(f"* loaded {INDEX_PREFIX} "
              f"(l_pac={idx.bns.l_pac:,}, "
              f"pos_dtype={'int32' if idx.pos_fits_int32 else 'int64'}"
              f") in {time.time() - t0:.1f}s", file=sys.stderr)
        fma_path = f"{INDEX_PREFIX}.fma{FMA_K}.npz"
        fma = load_fma(fma_path) if os.path.exists(fma_path) else None
        emf_path = f"{INDEX_PREFIX}.emf{READ_LEN}.npz"
        emf = (load_perfect_table(emf_path)
               if os.path.exists(emf_path) else None)
        cp2 = None
        if KSTEP:
            from bwa_mem_scale_tpu.index.kstep import load_cp2
            for kk in (KSTEP_K, 2):
                cp2_path = f"{INDEX_PREFIX}.cp{kk}.npz"
                if os.path.exists(cp2_path):
                    cp2 = load_cp2(cp2_path)
                    break
        cfg = PipelineConfig(max_coords=256, max_chains=32,
                             max_seeds_per_chain=16, max_regs=32,
                             max_pairs=4 * BATCH,
                             seed_engine=SEED_ENGINE,
                             seed_lanes=SEED_LANES)
        return TpuAligner(idx, MemOptions(), cfg,
                          fma=None if SEED_ENGINE == "readlane" else fma,
                          emf=emf, cp2=cp2)

    prefix = CACHE[: -len(".tpuidx.npz")]
    if os.path.exists(CACHE):
        idx = load_index(CACHE)
    else:
        print("* building benchmark index...", file=sys.stderr)
        t0 = time.time()
        bns = demo_genome(GENOME_BP, seed=7, n_contigs=1)
        # full SA residency: the MEMSCALE memory-for-speed tradeoff
        idx = build_index(bns, sa_compx=0)
        save_index(idx, prefix)
        print(f"* index built in {time.time() - t0:.1f}s", file=sys.stderr)

    fma_path = f"{prefix}.fma{FMA_K}.npz"
    if os.path.exists(fma_path):
        fma = load_fma(fma_path)
    else:
        t0 = time.time()
        fma = build_fma_table(DeviceFMIndex.from_host(idx), K=FMA_K)
        save_fma(fma, prefix)
        print(f"* FMA table (K={FMA_K}) built in {time.time() - t0:.1f}s",
              file=sys.stderr)

    emf_path = f"{prefix}.emf{READ_LEN}.npz"
    if os.path.exists(emf_path):
        emf = load_perfect_table(emf_path)
    else:
        t0 = time.time()
        emf = build_perfect_table(idx, seed_len=READ_LEN)
        save_perfect_table(emf, prefix)
        print(f"* EMF table built in {time.time() - t0:.1f}s",
              file=sys.stderr)

    cp2 = None
    if KSTEP:
        from bwa_mem_scale_tpu.index.kstep import (build_cp2, save_cp2,
                                                   load_cp2)
        cp2_path = f"{prefix}.cp{KSTEP_K}.npz"
        if os.path.exists(cp2_path):
            cp2 = load_cp2(cp2_path)
        else:
            t0 = time.time()
            cp2 = build_cp2(idx, K=KSTEP_K)
            save_cp2(cp2, prefix)
            print(f"* {KSTEP_K}-step table built in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)

    cfg = PipelineConfig(max_coords=256, max_chains=32,
                         max_seeds_per_chain=16, max_regs=32,
                         max_pairs=4 * BATCH, seed_engine=SEED_ENGINE,
                             seed_lanes=SEED_LANES)
    return TpuAligner(idx, MemOptions(), cfg,
                      fma=None if SEED_ENGINE == "readlane" else fma,
                      emf=emf, cp2=cp2)


def _probe_default_backend(timeout_s: int = 240) -> bool:
    """True if the default jax backend completes a tiny program.

    The axon TPU tunnel can wedge (dispatches hang, not fail); a
    hung bench run records nothing. Probe in a subprocess so a wedge
    is a timeout, then fall back to CPU with an honest metric tag."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp\n"
             "x = jnp.ones((64, 64))\n"
             "jax.block_until_ready(x @ x)\n"
             "print('BENCH_PROBE_OK')"],
            capture_output=True, text=True, timeout=timeout_s)
        return "BENCH_PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    global BENCH_TAG
    import jax

    if not _probe_default_backend():
        print("* default backend unresponsive; falling back to CPU "
              "(metric tagged _cpufallback)", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        BENCH_TAG = (BENCH_TAG or "") + "cpufallback"

    from bwa_mem_scale_tpu.models.aligner import simulate_reads

    print(f"* devices: {jax.devices()}", file=sys.stderr)
    aligner = get_aligner()
    batches = [simulate_reads(aligner.idx.bns, BATCH, READ_LEN,
                              seed=100 + i, err_rate=ERR)
               for i in range(N_BATCHES)]

    # Warmup / compile. The bigram (2-step) path first compiles on
    # real TPU hardware here; if it fails for any backend-specific
    # reason, fall back to the 1-step index rather than losing the
    # bench run.
    global KSTEP
    t0 = time.time()
    codes, lens = batches[0]
    try:
        recs = aligner.align_and_finalize(codes, lens)
    except Exception as e:
        if not KSTEP:
            raise
        print(f"* WARNING: warmup failed with the 2-step table "
              f"({type(e).__name__}: {e}); retrying without it",
              file=sys.stderr)
        KSTEP = False
        aligner = get_aligner()
        recs = aligner.align_and_finalize(codes, lens)
    print(f"* warmup (compile) {time.time() - t0:.1f}s", file=sys.stderr)
    n_mapped = sum(1 for r in recs if r and r[0].rid >= 0)
    print(f"* warmup mapped {n_mapped}/{BATCH}", file=sys.stderr)

    # Device-only timing (seeding+chaining+extension). A small fetch
    # per call is the only reliable sync on the axon tunnel.
    t0 = time.time()
    for codes, lens in batches:
        out = aligner._jit_extend(
            aligner.fmi, aligner.dbns,
            np.asarray(codes, dtype=np.int32),
            np.asarray(lens, dtype=np.int32), L=READ_LEN,
            fma=aligner.dfma, ert=aligner.dert)
        np.asarray(out["pair_overflow"])
    dev_dt = time.time() - t0
    dev_rps = N_BATCHES * BATCH / dev_dt
    print(f"* device stage: {dev_rps:,.0f} reads/s", file=sys.stderr)

    # End-to-end timing: EMF-compacted stream with one device batch
    # in flight (same machinery as the CLI driver).
    from bwa_mem_scale_tpu.pipeline.stream import SeStream
    stream = SeStream(aligner, BATCH, READ_LEN)
    # warm the compacted-batch compile path (skip_emf variant)
    stream.feed(*batches[0], 0)
    stream.flush()
    n_out = sum(1 for _ in stream.ready())
    assert n_out == BATCH

    from bwa_mem_scale_tpu.utils.profiling import PROFILER
    PROFILER.totals.clear()
    PROFILER.counts.clear()
    stream = SeStream(aligner, BATCH, READ_LEN)
    t0 = time.time()
    total = 0
    n_out = 0
    for codes, lens in batches:
        stream.feed(codes, lens, total)
        total += len(lens)
        n_out += sum(1 for _ in stream.ready())
    stream.flush()
    n_out += sum(1 for _ in stream.ready())
    assert n_out == total, (n_out, total)
    dt = time.time() - t0
    if os.environ.get("BENCH_PROFILE"):
        PROFILER.report()
    rps = total / dt
    print(f"* end-to-end: {rps:,.0f} reads/s ({dt:.2f}s for {total})",
          file=sys.stderr)
    if aligner.emf_checked:
        print(f"* EMF hits: {aligner.emf_hits}/{aligner.emf_checked}",
              file=sys.stderr)

    if BENCH_TAG:
        metric = f"se_reads_per_sec_chip_{BENCH_TAG}"
    elif INDEX_PREFIX:
        base = os.path.basename(INDEX_PREFIX).split(".")[0]
        metric = f"se_reads_per_sec_chip_{base}_{READ_LEN}bp"
    else:
        metric = ("se_reads_per_sec_chip_ecoli101"
                  if GENOME_BP == 4_600_000 and READ_LEN == 101 else
                  f"se_reads_per_sec_chip_{GENOME_BP // 1_000_000}"
                  f"mbp_{READ_LEN}bp")
    print(json.dumps({
        "metric": metric,
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BWAMEM2_40CORE_EST, 4),
    }))


if __name__ == "__main__":
    main()
