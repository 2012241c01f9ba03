"""Oracle FM-index search: occ, backward extension, SMEM passes, SA lookup.

Semantics follow the reference exactly:
- occ/GET_OCC: src/FMI_search.h:76-83 (adapted to 32-bp blocks)
- backward_ext: src/FMI_search.cpp:2029-2056
- SMEM search (one-pos): src/FMI_search.cpp:1372-1608
- all-pos driver: src/FMI_search.cpp:1608-1660
- third-pass seed strategy: src/FMI_search.cpp:1662-1815
- compressed SA lookup: src/FMI_search.cpp:2107-2200
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..index.artifacts import FMIndex, CP_SHIFT, CP_MASK, CP_BLOCK_SIZE


@dataclasses.dataclass
class Smem:
    rid: int
    m: int     # query start
    n: int     # query end (inclusive)
    k: int     # SA interval start
    l: int     # RC-BWT interval start
    s: int     # interval size


def _popcount32(x: int) -> int:
    return bin(x & 0xFFFFFFFF).count("1")


class FMOracle:
    def __init__(self, idx: FMIndex):
        self.idx = idx
        self.count = idx.count.astype(np.int64)
        self.cp_count = idx.cp_count
        self.cp_mask = idx.cp_mask
        self.sentinel_index = idx.sentinel_index
        # one_hot_mask_array equivalent: top-y-bits masks.
        self.topmask = np.zeros(CP_BLOCK_SIZE + 1, dtype=np.uint64)
        for y in range(1, CP_BLOCK_SIZE + 1):
            self.topmask[y] = (((1 << y) - 1) << (CP_BLOCK_SIZE - y))

    # -- occ ---------------------------------------------------------------
    def occ(self, pp: int, c: int) -> int:
        """#occurrences of base c in BWT[0..pp)."""
        block = pp >> CP_SHIFT
        y = pp & CP_MASK
        base = int(self.cp_count[block, c])
        mask = int(self.cp_mask[block, c]) & int(self.topmask[y])
        return base + _popcount32(mask)

    # -- backward extension ------------------------------------------------
    def backward_ext(self, smem: Smem, a: int) -> Smem:
        """Extend interval left by base a; returns new (k, l, s)."""
        k = [0] * 4
        s = [0] * 4
        for b in range(4):
            sp = smem.k
            ep = smem.k + smem.s
            occ_sp = self.occ(sp, b)
            occ_ep = self.occ(ep, b)
            k[b] = int(self.count[b]) + occ_sp
            s[b] = occ_ep - occ_sp
        sentinel_offset = (
            1 if (smem.k <= self.sentinel_index < smem.k + smem.s) else 0
        )
        l = [0] * 4
        l[3] = smem.l + sentinel_offset
        l[2] = l[3] + s[3]
        l[1] = l[2] + s[2]
        l[0] = l[1] + s[1]
        return Smem(rid=smem.rid, m=smem.m, n=smem.n,
                    k=k[a], l=l[a], s=s[a])

    def forward_ext(self, smem: Smem, a: int) -> Smem:
        """Forward extension = backward extension on the RC BWT via k/l swap
        (src/FMI_search.cpp:1477-1484)."""
        sw = Smem(smem.rid, smem.m, smem.n, k=smem.l, l=smem.k, s=smem.s)
        out = self.backward_ext(sw, 3 - a)
        return Smem(smem.rid, smem.m, smem.n, k=out.l, l=out.k, s=out.s)

    # -- SMEM search: one start position per read --------------------------
    def smems_one_pos(self, query: np.ndarray, x: int, rid: int,
                      min_intv: int, min_seed_len: int,
                      out: List[Smem]) -> int:
        """Find SMEMs through position x; append to `out`.

        Returns next_x. Mirrors getSMEMsOnePosOneThread for one read.
        """
        readlength = len(query)
        next_x = x + 1
        a = int(query[x])
        if a >= 4:
            return next_x

        smem = Smem(rid=rid, m=x, n=x,
                    k=int(self.count[a]), l=int(self.count[3 - a]),
                    s=int(self.count[a + 1] - self.count[a]))
        prev: List[Smem] = []

        # Forward pass.
        for j in range(x + 1, readlength):
            a = int(query[j])
            next_x = j + 1
            if a >= 4:
                break
            new = self.forward_ext(smem, a)
            new.n = j
            if new.s != smem.s:
                prev.append(smem)
            if new.s < min_intv:
                next_x = j
                break
            smem = new
        if smem.s >= min_intv:
            prev.append(smem)

        prev.reverse()

        # Backward pass.
        for j in range(x - 1, -1, -1):
            a = int(query[j])
            if a > 3:
                break
            curr: List[Smem] = []
            curr_s = -1
            emitted_or_kept = False
            p = 0
            for p in range(len(prev)):
                sm = prev[p]
                new = self.backward_ext(sm, a)
                new.m = j
                if new.s < min_intv and (sm.n - sm.m + 1) >= min_seed_len:
                    out.append(dataclasses.replace(sm))
                    emitted_or_kept = True
                    break
                if new.s >= min_intv and new.s != curr_s:
                    curr_s = new.s
                    curr.append(new)
                    emitted_or_kept = True
                    break
            if emitted_or_kept:
                for p2 in range(p + 1, len(prev)):
                    sm = prev[p2]
                    new = self.backward_ext(sm, a)
                    new.m = j
                    if new.s >= min_intv and new.s != curr_s:
                        curr_s = new.s
                        curr.append(new)
            prev = curr
            if not prev:
                break
        if prev:
            sm = prev[0]
            if sm.n - sm.m + 1 >= min_seed_len:
                out.append(dataclasses.replace(sm))
        return next_x

    # -- SMEM search: all positions ----------------------------------------
    def smems_all_pos(self, query: np.ndarray, rid: int, min_intv: int,
                      min_seed_len: int) -> List[Smem]:
        out: List[Smem] = []
        x = 0
        while x < len(query):
            x = self.smems_one_pos(query, x, rid, min_intv,
                                   min_seed_len, out)
        return out

    # -- third pass: seed strategy with max interval -----------------------
    def seed_strategy(self, query: np.ndarray, rid: int, max_intv: int,
                      min_seed_len: int) -> List[Smem]:
        """Forward-only pass emitting the first seed with s < max_intv
        (bwtSeedStrategyAllPosOneThread)."""
        out: List[Smem] = []
        readlength = len(query)
        x = 0
        while x < readlength:
            next_x = x + 1
            a = int(query[x])
            if a < 4:
                smem = Smem(rid=rid, m=x, n=x,
                            k=int(self.count[a]), l=int(self.count[3 - a]),
                            s=int(self.count[a + 1] - self.count[a]))
                for j in range(x + 1, readlength):
                    next_x = j + 1
                    a = int(query[j])
                    if a >= 4:
                        break
                    smem = self.forward_ext(smem, a)
                    smem.n = j
                    if (smem.s < max_intv
                            and smem.n - smem.m + 1 >= min_seed_len):
                        if smem.s > 0:
                            out.append(dataclasses.replace(smem))
                        break
            x = next_x
        return out

    # -- collect (3-pass driver, per read) ---------------------------------
    def collect_smems(self, query: np.ndarray, rid: int, opt) -> List[Smem]:
        """All three seeding passes + final (m, n) sort
        (mem_collect_smem, src/bwamem.cpp:648-795)."""
        split_len = opt.split_len
        smems = self.smems_all_pos(query, rid, 1, opt.min_seed_len)
        # Re-seeding pass at the midpoint of long, unique-ish SMEMs.
        reseed: List[Smem] = []
        for p in smems:
            start, end = p.m, p.n + 1
            if end - start < split_len or p.s > opt.split_width:
                continue
            x = (end + start) >> 1
            self.smems_one_pos(query, x, rid, p.s + 1,
                               opt.min_seed_len, reseed)
        third: List[Smem] = []
        if opt.max_mem_intv > 0:
            third = self.seed_strategy(query, rid, opt.max_mem_intv,
                                       opt.min_seed_len + 1)
        allm = smems + reseed + third
        allm.sort(key=lambda sm: (sm.m << 32) | sm.n)
        return allm

    # -- SA lookup ----------------------------------------------------------
    def bwt_base_at(self, pos: int) -> int:
        """Base code of BWT[pos]; 4 at the sentinel row."""
        block = pos >> CP_SHIFT
        y = CP_BLOCK_SIZE - (pos & CP_MASK) - 1
        for b in range(4):
            if (int(self.cp_mask[block, b]) >> y) & 1:
                return b
        return 4

    def sa_entry(self, pos: int) -> int:
        """Resolve SA[pos] via LF-walk to a sampled row
        (get_sa_entry_compressed, src/FMI_search.cpp:2107-2200)."""
        compx_mask = (1 << self.idx.sa_compx) - 1
        if (pos & compx_mask) == 0:
            return int(self.idx.sa_samples[pos >> self.idx.sa_compx])
        offset = 0
        sp = pos
        while True:
            b = self.bwt_base_at(sp)
            if b == 4:
                return offset
            sp = int(self.count[b]) + self.occ(sp, b)
            offset += 1
            if (sp & compx_mask) == 0:
                break
        return int(self.idx.sa_samples[sp >> self.idx.sa_compx]) + offset

    def sa_entries(self, smem: Smem, max_occ: int) -> List[int]:
        """Sampled coordinates for one SMEM (get_sa_entries,
        src/FMI_search.cpp:2200-2230)."""
        out = []
        step = smem.s // max_occ if smem.s > max_occ else 1
        j = smem.k
        hi = smem.k + smem.s
        while j < hi and len(out) < max_occ:
            out.append(self.sa_entry(j))
            j += step
        return out
