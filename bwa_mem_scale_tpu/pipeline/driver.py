"""Streaming alignment driver: FASTQ -> batches -> device -> SAM.

The TPU equivalent of the reference's 3-stage ktp pipeline
(src/fastmap.cpp:307-509): a reader thread prefetches fixed-bp chunks
(the -K determinism anchor), the main loop dispatches device batches
(async under jit), and finalization/SAM text runs while the next batch
computes. Output order is input order regardless of batching.
"""

from __future__ import annotations

import queue
import sys
import threading
from typing import List, Optional

import numpy as np

from ..io.fastq import iter_fastx, Read, ReadBatch
from ..io.sam import aln_to_sam_line
from ..utils.profiling import PROFILER


def _reader(paths: List[str], batch_reads: int, chunk_bp: Optional[int],
            q: "queue.Queue"):
    batch: List[Read] = []
    bp = 0
    for path in paths:
        for r in iter_fastx(path):
            batch.append(r)
            bp += len(r.seq)
            full = (len(batch) >= batch_reads
                    if chunk_bp is None else bp >= chunk_bp)
            if full:
                q.put(ReadBatch(batch))
                batch, bp = [], 0
    if batch:
        q.put(ReadBatch(batch))
    q.put(None)


def run_alignment(aligner, fastq_paths: List[str], out,
                  batch_reads: int = 512, chunk_bp: Optional[int] = None,
                  rg_id: Optional[str] = None, n_workers: int = 1) -> int:
    q: "queue.Queue" = queue.Queue(maxsize=4)
    t = threading.Thread(target=_reader,
                         args=(fastq_paths, batch_reads, chunk_bp, q),
                         daemon=True)
    t.start()
    n_reads = 0
    id_offset = 0
    opt = aligner.opt
    bns = aligner.idx.bns
    while True:
        item = q.get()
        if item is None:
            break
        batch = item
        with PROFILER.phase("align_batch"):
            codes, lens = batch.padded_codes()
            records_per_read = aligner.align_and_finalize(
                codes.astype(np.int32), lens, id_offset)
        with PROFILER.phase("sam_write"):
            for read, records in zip(batch.reads, records_per_read):
                for which in range(len(records)):
                    out.write(aln_to_sam_line(opt, bns, read,
                                              len(records), records,
                                              which, rg_id=rg_id))
        n_reads += len(batch)
        id_offset += len(batch)
    t.join()
    if getattr(aligner, "emf_checked", 0):
        print(f"* EMF perfect-match hits: {aligner.emf_hits}/"
              f"{aligner.emf_checked} reads short-circuited",
              file=sys.stderr)
    return n_reads
