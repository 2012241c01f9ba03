"""2-step (bigram) FM-index checkpoint table — trade HBM row width
for dependent-gather depth.

The seeding machines' cost on TPU is the *number of sequential
checkpoint-row gathers* (each tick is latency-bound, ~0.4-0.9 ms for
thousands of lanes; row width is nearly free). The reference attacks
FM-walk cost with cache-resident helper tables (SMEM_ACCEL,
src/FMI_search.cpp:1414-1463); the TPU-native equivalent is the
n-step FM-index (Chacon et al.): checkpoint occ counts for all 16
BWT *bigrams* B2[i] = (BWT[i], BWT[LF(i)]) let one row gather extend
a bi-interval by TWO bases, halving the tick count of every forward
extension loop.

Correctness basis (verified exhaustively in tests/test_kstep.py):
  range(c2 c1 P) = [ C2[c1,c2] + occ2(k, c1c2),  + s2 )
  with  C2[c1,c2] = C[c2] + occ1(C[c1], c2)
        occ2(p, c1c2) = #{ i < p : BWT[i]=c1 and BWT[LF(i)]=c2 }
(LF maps the c1-class of [0, k) monotonically onto
[C[c1], LF_c1(k)), so the second step's occ1 decomposes into the
constant C2 plus occ2 at the ORIGINAL position.) The intermediate
interval (k1, l1, s1) and the rc-side l updates — including both
sentinel corrections — are recoverable from the same row because
s''(c) = occ2diff(c1->c) for every c.

The fused device row is [nb, 40] int32 per 32-position block:
counts2[16] | masks2[16] | counts1[4] | masks1[4] — one gather serves
the 2-step extension, the embedded 1-step (for boundary resolution
when s changes mid-stride), and the sentinel checks.

Pairs whose second step crosses the text start (LF lands on the
sentinel row) or whose first char is the sentinel belong to no bigram
class; the embedded 1-step counts keep those lanes exact.

Scope: int32-position genomes (the bigram table costs 5 B/position —
the same memory-for-speed class as ERT/FMA; hg38 seeding stays on the
1-step readlane machine, see LIMITS.md).
"""

from __future__ import annotations

import dataclasses

import numpy as np

CP2_SHIFT = 5          # 32 positions per block, matching ops/occ.py
CP2_BLOCK = 1 << CP2_SHIFT


@dataclasses.dataclass
class Cp2Table:
    """Host bigram-checkpoint artifact."""

    fused: np.ndarray    # [nb, 40] int32 (see module doc)
    c2: np.ndarray       # [16] int64: C2[c1*4+c2]
    seq_len: int

    def nbytes(self) -> int:
        return self.fused.nbytes + self.c2.nbytes


def extract_bwt(idx) -> np.ndarray:
    """BWT chars (uint8, 4 at the sentinel row) from the checkpoint
    masks (the index stores the BWT only in that form)."""
    n = idx.seq_len
    nb = idx.cp_mask.shape[0]
    # bit (31 - y) of mask[block, c] set <=> BWT[block*32 + y] == c
    masks = idx.cp_mask.astype(np.uint32)              # [nb, 4]
    shifts = (31 - np.arange(CP2_BLOCK, dtype=np.uint32))
    bwt = np.full(nb * CP2_BLOCK, 4, dtype=np.uint8)
    for c in range(4):
        bits = (masks[:, c][:, None] >> shifts[None, :]) & 1
        bwt[bits.reshape(-1).astype(bool)] = c
    return bwt[:n]


def build_cp2(idx) -> Cp2Table:
    """Build the bigram checkpoint table from an FMIndex artifact."""
    if not idx.pos_fits_int32:
        raise ValueError("2-step table supports int32-position "
                         "genomes only (see module doc)")
    n = idx.seq_len
    count = np.asarray(idx.count, dtype=np.int64)
    bwt = extract_bwt(idx)

    # LF as a permutation: LF over the c-class is count[c] + rank
    lf = np.zeros(n, dtype=np.int64)
    for c in range(4):
        rows = np.flatnonzero(bwt == c)
        lf[rows] = count[c] + np.arange(len(rows), dtype=np.int64)
    second = np.full(n, 4, dtype=np.uint8)
    has = bwt < 4
    second[has] = bwt[lf[has]]

    pair = np.full(n, 16, dtype=np.int64)       # 16 = no bigram class
    both = has & (second < 4)
    pair[both] = bwt[both].astype(np.int64) * 4 + second[both]

    nb = (n + CP2_BLOCK - 1) >> CP2_SHIFT
    npad = nb * CP2_BLOCK
    pair_pad = np.full(npad, 16, dtype=np.int64)
    pair_pad[:n] = pair
    block = np.arange(npad, dtype=np.int64) >> CP2_SHIFT

    # per-block bigram counts -> exclusive cumulative counts2
    per_block = np.bincount(block * 17 + pair_pad,
                            minlength=nb * 17).reshape(nb, 17)[:, :16]
    counts2 = np.zeros((nb, 16), dtype=np.int64)
    counts2[1:] = np.cumsum(per_block, axis=0)[:-1]

    # per-block bit masks, bit (31 - y) for offset y
    shifts = (31 - np.arange(CP2_BLOCK, dtype=np.uint32))
    masks2 = np.zeros((nb, 16), dtype=np.uint32)
    pp = pair_pad.reshape(nb, CP2_BLOCK)
    for c in range(16):
        bits = (pp == c).astype(np.uint32)
        masks2[:, c] = (bits << shifts[None, :]).sum(
            axis=1, dtype=np.uint32)

    fused = np.concatenate(
        [counts2.astype(np.int32),
         masks2.view(np.int32),
         np.asarray(idx.cp_count, dtype=np.int32),
         np.asarray(idx.cp_mask).view(np.int32)], axis=1)
    assert fused.shape == (nb, 40)

    # C2[c1,c2] = C[c2] + occ1(C[c1], c2)
    occ_at = np.zeros((4, 4), dtype=np.int64)   # occ1(C[c1], c2)
    for c2 in range(4):
        cum = np.cumsum(bwt == c2)
        for c1 in range(4):
            p = int(count[c1])
            occ_at[c1, c2] = cum[p - 1] if p > 0 else 0
    c2tab = (count[None, :4] + occ_at).reshape(16)
    return Cp2Table(fused=np.ascontiguousarray(fused),
                    c2=c2tab.astype(np.int64), seq_len=n)


def save_cp2(t: Cp2Table, prefix: str) -> str:
    path = f"{prefix}.cp2.npz"
    np.savez(path, fused=t.fused, c2=t.c2,
             seq_len=np.int64(t.seq_len))
    return path


def load_cp2(path: str) -> Cp2Table:
    from ..utils.npzmap import load_npz_mmap
    z = load_npz_mmap(path)
    return Cp2Table(fused=z["fused"], c2=z["c2"],
                    seq_len=int(z["seq_len"]))
