"""EMF device lookup — batched perfect-match probe.

Per read: canonicalize the seed (first seed_len bases), hash it, walk
the linear-probe table (a handful of row gathers), and verify the one
fingerprint-matching candidate by comparing the full read against the
reference bytes in both orientations. Mirrors the semantics of
find_perfect_match_entry (src/perfect_map.cpp:583-661) including the
longer-than-seed verification (__seedmatch_further, src/perfect.h:474)
and, when the entry's representative location fails it, the scan of
the entry's multi-location list in the reference's order
(seedmatch_further, src/perfect_map.cpp:528-570) — gated so batches
with no such read pay nothing.

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
    fwless: jax.Array   # uint8 [ncap] canonical orientation at loc
    mlidx: jax.Array    # int32 [ncap]; -1 = single location
    ml_off: jax.Array   # int64 [nml + 1]
    ml_nfw: jax.Array   # int32 [nml]
    ml_locs: jax.Array  # int64 [total]
    seed_len: int
    l_pac: int
    max_probe: int

    def tree_flatten(self):
        return (self.loc, self.fp, self.cnt, self.fwless, self.mlidx,
                self.ml_off, self.ml_nfw, self.ml_locs), (
            self.seed_len, self.l_pac, self.max_probe)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, pt: PerfectTable) -> "DeviceEmf":
        # pad the variable tables so gathers stay in-bounds even for
        # nml == 0
        ml_off = np.asarray(pt.ml_off, np.int64)
        if ml_off.size < 2:
            ml_off = np.zeros(2, np.int64)
        ml_nfw = np.asarray(pt.ml_nfw, np.int32)
        if ml_nfw.size < 1:
            ml_nfw = np.zeros(1, np.int32)
        ml_locs = np.asarray(pt.ml_locs, np.int64)
        if ml_locs.size < 1:
            ml_locs = np.zeros(1, np.int64)
        return cls(loc=jnp.asarray(pt.loc), fp=jnp.asarray(pt.fp),
                   cnt=jnp.asarray(pt.cnt),
                   fwless=jnp.asarray(pt.fwless),
                   mlidx=jnp.asarray(pt.mlidx),
                   ml_off=jnp.asarray(ml_off),
                   ml_nfw=jnp.asarray(ml_nfw),
                   ml_locs=jnp.asarray(ml_locs),
                   seed_len=pt.seed_len,
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
    from .occ import ref_byte
    l_pac2 = 2 * emf.l_pac
    reff = ref_byte(ref, loc[:, None] + iota[None, :], emf.l_pac)
    refr = ref_byte(ref, pos_rc[:, None] + iota[None, :], emf.l_pac)
    fwm = (has_cand & okf
           & jnp.all(~in_len | (reff == codes), axis=1))
    rcm = (has_cand & okr
           & jnp.all(~in_len | (refr == rcr), axis=1))

    # Multi-location rescue for reads longer than the seed whose
    # entry location fails the extension check: scan the entry's
    # location list in the reference's order — forward sublist with
    # the canonical orientation, then the reverse sublist flipped
    # (seedmatch_further, src/perfect_map.cpp:528-570). Gated on
    # "any lane needs it" so ordinary batches pay nothing.
    mi0 = jnp.where(has_cand, emf.mlidx[slot], -1)
    need = (has_cand & (lens > S) & ~fwm & ~rcm & (mi0 >= 0)
            & ~has_n & ~too_short)

    def _rescue(_):
        mic = jnp.clip(mi0, 0)
        lo = emf.ml_off[mic]
        hi = emf.ml_off[mic + 1]
        nfw = (lo + emf.ml_nfw[mic].astype(jnp.int64))
        n_list = hi - lo
        ent_fwless = emf.fwless[slot] != 0
        is_rev0 = ent_fwless != fwle
        nL = emf.ml_locs.shape[0]

        def cond(st):
            return jnp.any(st["active"])

        def body(st):
            j = st["j"]
            cidx = lo + j
            in_list = st["active"] & (j < n_list)
            loc_c = emf.ml_locs[jnp.clip(cidx, 0, nL - 1)]
            isrev = jnp.where(cidx < nfw, is_rev0, ~is_rev0)
            posr = loc_c - (lens - S).astype(jnp.int64)
            start = jnp.where(isrev, posr, loc_c)
            okb = jnp.where(isrev, posr >= 0,
                            loc_c + lens <= emf.l_pac)
            win = ref_byte(ref, start[:, None] + iota[None, :],
                           emf.l_pac)
            tgt = jnp.where(isrev[:, None], rcr, codes)
            okm = (in_list & okb
                   & jnp.all(~in_len | (win == tgt), axis=1))
            newly = okm & ~st["found"]
            return dict(
                j=j + 1,
                active=st["active"] & ~okm & (j + 1 < n_list),
                found=st["found"] | okm,
                floc=jnp.where(newly, loc_c, st["floc"]),
                frev=jnp.where(newly, isrev, st["frev"]))

        st = jax.lax.while_loop(cond, body, dict(
            j=jnp.zeros((), jnp.int64),
            active=need,
            found=jnp.zeros((B,), bool),
            floc=jnp.zeros((B,), jnp.int64),
            frev=jnp.zeros((B,), bool)))
        return st["found"], st["floc"], st["frev"]

    def _no_rescue(_):
        return (jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int64),
                jnp.zeros((B,), bool))

    r_found, r_loc, r_rev = jax.lax.cond(jnp.any(need), _rescue,
                                         _no_rescue, None)
    fwm = fwm | (r_found & ~r_rev)
    rcm = rcm | (r_found & r_rev)
    loc = jnp.where(r_found, r_loc, loc)

    code = jnp.where(
        too_short, NO_TABLE,
        jnp.where(has_n, WITH_N,
                  jnp.where(fwm, FW_MATCHED,
                            jnp.where(rcm, RC_MATCHED, NOT_MATCHED))))
    return dict(code=code.astype(jnp.int32), slot=slot,
                loc=jnp.where(fwm | rcm, loc, -1),
                n_loc=jnp.where(has_cand, emf.cnt[slot], 0))
