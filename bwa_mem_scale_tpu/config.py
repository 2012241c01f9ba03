"""Alignment options.

Mirrors the reference's runtime option struct (``mem_opt_t``,
reference: src/bwamem.h:89-124, defaults src/bwamem.cpp:135-171) so that
scoring/seeding/banding semantics — and therefore SAM output — match.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# Output-mode flags (reference: src/bwamem.h:56-72).
MEM_F_PE = 0x2
MEM_F_NOPAIRING = 0x4
MEM_F_ALL = 0x8
MEM_F_NO_MULTI = 0x10
MEM_F_NO_RESCUE = 0x20
MEM_F_REF_HDR = 0x100
MEM_F_SOFTCLIP = 0x200
MEM_F_SMARTPE = 0x400
MEM_F_PRIMARY5 = 0x800
MEM_F_KEEP_SUPP_MAPQ = 0x1000

MEM_MAPQ_COEF = 30.0


def fill_scmat(a: int, b: int) -> np.ndarray:
    """5x5 substitution matrix: +a on match, -b on mismatch, -1 vs N.

    Reference: src/bwa.cpp:369-378 (bwa_fill_scmat).
    """
    mat = np.full((5, 5), -1, dtype=np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = a if i == j else -b
    mat[4, :] = -1
    mat[:, 4] = -1
    return mat


def needs_seed_sw_filter(opt, l_query: int) -> bool:
    """True when mem_flt_chained_seeds is NOT a no-op for this read
    length — the long-read regime (src/bwamem.cpp:506-513: skip when
    min_l > MEM_SEEDSW_COEF * l_query). Reads in this regime are
    routed through the oracle pipeline, which implements the seed-SW
    filter (ref/chain.flt_chained_seeds)."""
    import math
    min_l = (1.1 * opt.min_chain_weight if opt.min_chain_weight
             else 5.5 * math.log(max(l_query, 2)))
    return min_l <= 0.05 * l_query


@dataclasses.dataclass
class MemOptions:
    """Runtime alignment options (defaults = reference mem_opt_init)."""

    # Scoring.
    a: int = 1                  # match score
    b: int = 4                  # mismatch penalty
    o_del: int = 6
    e_del: int = 1
    o_ins: int = 6
    e_ins: int = 1
    pen_unpaired: int = 17
    pen_clip5: int = 5
    pen_clip3: int = 5
    w: int = 100                # band width
    zdrop: int = 100
    # Seeding.
    min_seed_len: int = 19
    split_factor: float = 1.5
    split_width: int = 10
    max_occ: int = 500
    max_mem_intv: int = 20
    max_chain_gap: int = 10000
    min_chain_weight: int = 0
    max_chain_extend: int = 1 << 30
    # Filtering / output.
    T: int = 30                 # min output score
    mask_level: float = 0.50
    drop_ratio: float = 0.50
    XA_drop_ratio: float = 0.80
    mask_level_redun: float = 0.95
    max_XA_hits: int = 5
    max_XA_hits_alt: int = 200
    mapQ_coef_len: int = 50
    mapQ_coef_fac: float = math.log(50)
    flag: int = 0
    # Paired-end.
    max_ins: int = 10000
    max_matesw: int = 50
    copy_comment: bool = False   # -C: append FASTQ comment to SAM
    # Infra.
    chunk_size: int = 10000000
    n_threads: int = 1

    def __post_init__(self):
        self.mat = fill_scmat(self.a, self.b)

    def rescale(self, base: "MemOptions") -> None:
        """Re-scale penalty defaults when -A is changed (reference
        fastmap.cpp update_a semantics)."""
        self.b *= self.a
        self.T *= self.a
        self.o_del *= self.a
        self.e_del *= self.a
        self.o_ins *= self.a
        self.e_ins *= self.a
        self.zdrop *= self.a
        self.pen_clip5 *= self.a
        self.pen_clip3 *= self.a
        self.pen_unpaired *= self.a
        self.mat = fill_scmat(self.a, self.b)

    @property
    def split_len(self) -> int:
        return int(self.min_seed_len * self.split_factor + 0.499)


def cal_max_gap(opt: MemOptions, qlen: int):
    """Max gap length budget for a flank of length qlen.

    Reference: src/bwamem.cpp:94-105. Works on scalars or numpy arrays.
    """
    l_del = np.int64((np.float64(qlen) * opt.a - opt.o_del) / opt.e_del + 1.0)
    l_ins = np.int64((np.float64(qlen) * opt.a - opt.o_ins) / opt.e_ins + 1.0)
    l = np.maximum(np.maximum(l_del, l_ins), 1)
    return np.minimum(l, opt.w << 1)
