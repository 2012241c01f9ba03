"""Flagship model: the batched FM-index aligner.

This framework's "model" is the alignment computation itself — the
fused seed->chain->extend device program over a batch of reads. These
helpers build small self-contained instances (synthetic genome + index
+ simulated reads) for compile checks, dry runs, and benchmarks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import MemOptions
from ..index.bntseq import BntSeq, Annotation
from ..index.build import build_index
from ..index.artifacts import FMIndex
from ..pipeline.align import TpuAligner, PipelineConfig


def demo_genome(n: int = 50000, seed: int = 0, n_contigs: int = 2
                ) -> BntSeq:
    rng = np.random.RandomState(seed)
    seq = rng.randint(0, 4, size=n).astype(np.uint8)
    per = n // n_contigs
    anns = []
    off = 0
    for i in range(n_contigs):
        ln = per if i < n_contigs - 1 else n - off
        anns.append(Annotation(name=f"chr{i + 1}", anno="(null)",
                               offset=off, length=ln, n_ambs=0))
        off += ln
    return BntSeq(l_pac=n, anns=anns, ambs=[], seq=seq)


def simulate_reads(bns: BntSeq, n_reads: int, read_len: int,
                   seed: int = 1, err_rate: float = 0.01
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Simulated read batch: (codes [B, L] int32, lens [B] int32)."""
    rng = np.random.RandomState(seed)
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    codes = np.zeros((n_reads, read_len), dtype=np.int32)
    for i in range(n_reads):
        pos = rng.randint(0, bns.l_pac - read_len)
        frag = bns.seq[pos: pos + read_len].copy()
        if rng.randint(2):
            frag = comp[frag[::-1]]
        if err_rate > 0:
            err = rng.rand(read_len) < err_rate
            frag[err] = (frag[err] + rng.randint(1, 4, size=int(err.sum()))
                         ) % 4
        codes[i] = frag
    lens = np.full(n_reads, read_len, dtype=np.int32)
    return codes, lens


def build_demo_aligner(genome_bp: int = 50000, seed: int = 0,
                       opt: Optional[MemOptions] = None,
                       cfg: Optional[PipelineConfig] = None
                       ) -> TpuAligner:
    bns = demo_genome(genome_bp, seed)
    idx = build_index(bns)
    return TpuAligner(idx, opt or MemOptions(),
                      cfg or PipelineConfig(max_coords=256, max_chains=32,
                                            max_seeds_per_chain=16,
                                            max_regs=32))
