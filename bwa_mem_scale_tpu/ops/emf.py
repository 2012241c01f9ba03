"""EMF device lookup — batched perfect-match probe.

Per read: canonicalize the seed (first seed_len bases), hash it, walk
the linear-probe table (a handful of row gathers), and verify the one
fingerprint-matching candidate by comparing the full read against the
reference bytes in both orientations. Mirrors the semantics of
find_perfect_match_entry (src/perfect_map.cpp:583-661) including the
longer-than-seed verification (__seedmatch_further, src/perfect.h:474)
— except that only the entry's primary location is verified on device
for the len > seed_len case; a miss there falls back to the normal
pipeline (same SAM, slower) rather than scanning the multi-location
list.

Return codes match the reference's FIND_PERFECT_* (src/perfect.h:902):
0 no-table/short, 1 with-N, 2 not-matched, 3 fw-matched, 4 rc-matched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..index.perfect import PerfectTable, _M1, _M2, _MG

NO_TABLE, WITH_N, NOT_MATCHED, FW_MATCHED, RC_MATCHED = range(5)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceEmf:
    loc: jax.Array      # int64 [ncap]
    fp: jax.Array       # uint32 [ncap]
    cnt: jax.Array      # int32 [ncap]
    seed_len: int
    l_pac: int
    max_probe: int

    def tree_flatten(self):
        return (self.loc, self.fp, self.cnt), (
            self.seed_len, self.l_pac, self.max_probe)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, pt: PerfectTable) -> "DeviceEmf":
        return cls(loc=jnp.asarray(pt.loc), fp=jnp.asarray(pt.fp),
                   cnt=jnp.asarray(pt.cnt), seed_len=pt.seed_len,
                   l_pac=pt.l_pac, max_probe=max(pt.max_probe, 1))


def _fmix64(k):
    k = k.astype(jnp.uint64)
    k ^= k >> jnp.uint64(33)
    k = k * jnp.uint64(_M1)
    k ^= k >> jnp.uint64(33)
    k = k * jnp.uint64(_M2)
    k ^= k >> jnp.uint64(33)
    return k


def emf_lookup(emf: DeviceEmf, ref: jax.Array, codes, lens):
    """codes [B, L] int32 (nt4), lens [B]. Returns dict of
    code [B] int32, slot [B] int32, loc [B] int64 (primary matched
    location; valid for codes 3/4)."""
    B, L = codes.shape
    S = emf.seed_len
    assert L >= S, "pad reads to at least seed_len before EMF lookup"
    iota = jnp.arange(L, dtype=jnp.int32)
    in_len = iota[None, :] < lens[:, None]
    has_n = jnp.any(in_len & (codes >= 4), axis=1)
    too_short = lens < S

    fw = jnp.clip(codes[:, :S], 0, 3)
    rcs = 3 - fw[:, ::-1]                       # seed reverse complement
    # full-read reverse complement (variable length)
    ridx = jnp.clip(lens[:, None] - 1 - iota[None, :], 0, L - 1)
    rcr = 3 - jnp.clip(jnp.take_along_axis(codes, ridx, axis=1), 0, 3)

    # lexicographic fw <= rc over the seed
    neq = fw != rcs
    first = jnp.argmax(neq, axis=1)
    any_neq = jnp.any(neq, axis=1)
    bidx = jnp.arange(B)
    fwle = jnp.where(any_neq, fw[bidx, first] < rcs[bidx, first], True)
    canon = jnp.where(fwle[:, None], fw, rcs)

    # pack + hash (must match index/perfect.py)
    W = (S + 31) // 32
    padded = jnp.zeros((B, W * 32), dtype=jnp.uint64)
    padded = padded.at[:, :S].set(canon.astype(jnp.uint64))
    shifts = (jnp.uint64(2) * (31 - jnp.arange(32, dtype=jnp.uint64)))
    words = jnp.sum(padded.reshape(B, W, 32) << shifts[None, None, :],
                    axis=2, dtype=jnp.uint64)
    h = jnp.full((B,), jnp.uint64(S))
    for j in range(W):
        h = _fmix64((h ^ words[:, j]) * jnp.uint64(_MG))
    fpq = (h >> jnp.uint64(32)).astype(jnp.uint32)

    ncap = emf.loc.shape[0]
    mask = jnp.uint64(ncap - 1)
    P = emf.max_probe
    slots = ((h[:, None] + jnp.arange(P, dtype=jnp.uint64)[None, :])
             & mask).astype(jnp.int32)          # [B, P]
    loc_p = emf.loc[slots]
    nonempty = loc_p >= 0
    alive = jnp.cumprod(nonempty.astype(jnp.int32), axis=1) > 0
    cand = alive & (emf.fp[slots] == fpq[:, None])
    sel = jnp.argmax(cand, axis=1)
    has_cand = jnp.any(cand, axis=1)
    slot = slots[bidx, sel]
    loc = jnp.where(has_cand, loc_p[bidx, sel], 0)

    # verify full read against the reference at the candidate location
    pos_rc = loc - (lens - S).astype(jnp.int64)
    okf = loc + lens <= emf.l_pac
    okr = pos_rc >= 0
    l_pac2 = 2 * emf.l_pac
    reff = ref[jnp.clip(loc[:, None] + iota[None, :], 0, l_pac2 - 1)]
    refr = ref[jnp.clip(pos_rc[:, None] + iota[None, :], 0, l_pac2 - 1)]
    fwm = (has_cand & okf
           & jnp.all(~in_len | (reff == codes), axis=1))
    rcm = (has_cand & okr
           & jnp.all(~in_len | (refr == rcr), axis=1))

    code = jnp.where(
        too_short, NO_TABLE,
        jnp.where(has_n, WITH_N,
                  jnp.where(fwm, FW_MATCHED,
                            jnp.where(rcm, RC_MATCHED, NOT_MATCHED))))
    return dict(code=code.astype(jnp.int32), slot=slot,
                loc=jnp.where(fwm | rcm, loc, -1),
                n_loc=jnp.where(has_cand, emf.cnt[slot], 0))
