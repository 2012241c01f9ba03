"""ERT seeding on device — suffix-trie descent, position-parallel.

Replaces the FM-index extension of ops/smem.py with descent of the
SA-range trie built by index/ert.py (the reference's ERT walk,
src/ertseeding.cpp:836-975 getNextByteIdx / 2142 rightExtend, re-shaped
for lockstep lanes). Per step each lane costs ONE fused child-record
gather while on an internal node, and one reference-byte compare once
its range is a single occurrence (the reference's lazy leaf
verification, src/ertseeding.cpp:2950) — cheaper than the two occ
gathers of FM extension.

Because trie nodes carry true SA ranges, the emitted SmemBuf is
bit-identical to the FM seeder's in (m, n, k, s) — `l` (the rc-side
interval) is not represented in the trie and is emitted as 0; nothing
downstream consumes it (chaining/SAL/frac_rep read m/n/k/s only).

The three passes mirror ops/smem.py: one pass-1 sweep with merged
pass-3 failure records, a task-compacted pass-2 sweep, and the same
analytic zombie reconstruction for pass 3 (see
smems_seed_strategy_merged) — that logic is shared by importing it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..index.ert import ErtIndex
from .smem import (SmemBuf, _emit_compact, concat_smems,
                   smems_seed_strategy_merged)

CNT_BITS = 24
CNT_MASK = (1 << CNT_BITS) - 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceErt:
    """ERT arrays resident on device.

    child_rec [N, 8] int64: per node, 4 child encodings followed by 4
    packed child payloads ((lo_or_pos << 24) | min(cnt, 2^24-1); for a
    single-occurrence child the payload carries the REF POSITION so
    leaf verification needs no SA gather, while the encoding carries
    the SA row for bit-identical seed intervals).
    """

    child_rec: jax.Array   # [N, 8] int64
    root: int              # root node id
    count: jax.Array       # [5] per-base SA range starts (depth-1)
    max_depth: int

    def tree_flatten(self):
        return (self.child_rec, self.count), (self.root, self.max_depth)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], children[1], aux[1])

    @classmethod
    def from_host(cls, ert: ErtIndex, sa: np.ndarray,
                  count: np.ndarray) -> "DeviceErt":
        """Pack the host trie + add a synthetic root whose children are
        the depth-1 base ranges (count[] boundaries). `sa` is the full
        suffix array (row 0 = sentinel) for leaf position resolution.
        Builder must have been run over the same text/SA."""
        N = ert.n_nodes
        n_tot = N + 1
        rec = np.full((n_tot, 8), -1, dtype=np.int64)

        def payload(lo_rows, cnts):
            # cnt==1 children carry SA[row] (the ref position)
            lo_or_pos = np.where(cnts == 1, sa[lo_rows], lo_rows)
            return ((lo_or_pos.astype(np.int64) << CNT_BITS)
                    | np.minimum(cnts, CNT_MASK).astype(np.int64))

        # interior nodes (ids 0..N-1 -> rows 0..N-1)
        enc = ert.child_ptr.copy()
        child_lo = np.zeros((N, 4), dtype=np.int64)
        child_cnt = np.zeros((N, 4), dtype=np.int64)
        is_node = enc >= 0
        is_leaf = enc <= -2
        child_lo[is_node] = ert.node_lo[enc[is_node]]
        child_cnt[is_node] = ert.node_cnt[enc[is_node]]
        child_lo[is_leaf] = -enc[is_leaf] - 2
        child_cnt[is_leaf] = 1
        rec[:N, :4] = enc
        rec[:N, 4:] = payload(child_lo.reshape(-1),
                              child_cnt.reshape(-1)).reshape(N, 4)
        rec[:N, 4:][~(is_node | is_leaf)] = 0

        # synthetic root (id N): the builder's depth-1 encodings
        root = N
        lo1 = np.asarray(count[:4], dtype=np.int64)
        cnt1 = np.asarray(count[1:5], dtype=np.int64) - lo1
        rec[root, :4] = ert.root_children
        rec[root, 4:] = payload(lo1, cnt1)
        rec[root, 4:][cnt1 == 0] = 0
        return cls(child_rec=jnp.asarray(rec), root=root,
                   count=jnp.asarray(count, dtype=jnp.int64),
                   max_depth=ert.max_depth)


def ert_extend_all_positions(ert: DeviceErt, ref, codes, lens, min_intv,
                             check_initial: bool,
                             p3_max_intv: int = 0, p3_stop: int = 0,
                             pos_dtype=jnp.int64, seq_len: int = None):
    """Trie-descent counterpart of smem.extend_all_positions; returns
    the same output dict (l fields omitted / zero).

    `seq_len` bounds the leaf walk by the TRUE fw+rc sequence length
    (2*l_pac): DeviceFMIndex._pack_ref zero-pads refs >= 4 KiB to a
    128-byte multiple, and pad bytes are code 0 ('A') — bounding by
    the padded array length would let reads spuriously match phantom
    A bases past the rc strand end."""
    B, L = codes.shape
    pcol = jnp.arange(L, dtype=jnp.int32)[None, :]
    mi = min_intv.astype(pos_dtype)[:, None]
    base_ok = (pcol < lens[:, None]) & (codes < 4)
    merge_p3 = p3_max_intv > 0 and p3_stop > 0
    l_ref = seq_len if seq_len is not None else ref.shape[0]

    # step 1 from the synthetic root
    a0c = jnp.clip(codes, 0, 3)
    root_rec = ert.child_rec[ert.root]            # [8]
    enc = root_rec[a0c]
    packed = root_rec[a0c + 4]
    s = (packed & CNT_MASK).astype(pos_dtype)
    lo_or_pos = (packed >> CNT_BITS).astype(pos_dtype)
    is_leaf0 = enc <= -2
    k = jnp.where(is_leaf0, (-enc - 2).astype(pos_dtype),
                  lo_or_pos)
    # leaf walk offset: ref[leaf_pos + j] is the byte matching read
    # base j of this lane (leaf_pos = occurrence_pos - p)
    leaf_pos = jnp.where(is_leaf0,
                         lo_or_pos.astype(jnp.int64)
                         - pcol.astype(jnp.int64), 0)
    active = base_ok & (s >= mi) if check_initial else base_ok
    active = active & (s > 0)
    E = jnp.where(base_ok & (s >= (mi if check_initial else 1)),
                  pcol + 1, pcol)
    zero = jnp.zeros((), pos_dtype)
    k = jnp.where(active, k, zero)
    s = jnp.where(active, s, zero)
    cur = jnp.where(active, enc, -1)

    died_s = jnp.zeros((B, L), dtype=bool)
    f3_s = jnp.zeros((B, L), dtype=bool)
    f3_E = jnp.zeros((B, L), dtype=jnp.int32)
    f3_k = jnp.zeros((B, L), dtype=pos_dtype)
    f3_ss = jnp.zeros((B, L), dtype=pos_dtype)

    codes_pad = jnp.pad(codes, ((0, 0), (0, L + 2)), constant_values=4)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        (act, t, E, cur, k, s, lp, ds, f3s, f3E, f3k, f3v) = st
        j = pcol + t
        in_range = j < lens[:, None]
        a = jax.lax.dynamic_slice(codes_pad, (jnp.int32(0), t), (B, L))
        is_n = a >= 4
        do = act & in_range & ~is_n
        on_node = cur >= 0
        # node lanes: one fused child-record gather
        rows = ert.child_rec[jnp.clip(cur, 0, None)]      # [B, L, 8]
        ai = jnp.clip(a, 0, 3)[..., None]
        n_enc = jnp.take_along_axis(rows, ai, axis=-1)[..., 0]
        n_packed = jnp.take_along_axis(rows, ai + 4, axis=-1)[..., 0]
        n_cnt = (n_packed & CNT_MASK).astype(pos_dtype)
        n_lop = (n_packed >> CNT_BITS)
        # leaf lanes: one reference-byte compare
        rpos = lp + j.astype(jnp.int64)
        rbase = ref[jnp.clip(rpos, 0, l_ref - 1)].astype(jnp.int32)
        lmatch = (rpos >= 0) & (rpos < l_ref) \
            & (rbase == jnp.clip(a, 0, 3))

        ns = jnp.where(on_node, n_cnt,
                       jnp.where(lmatch, jnp.ones((), pos_dtype),
                                 zero))
        new_leaf = on_node & (n_enc <= -2)
        nk = jnp.where(on_node,
                       jnp.where(new_leaf,
                                 (-n_enc - 2).astype(pos_dtype),
                                 n_lop.astype(pos_dtype)),
                       k)
        nlp = jnp.where(new_leaf,
                        n_lop.astype(jnp.int64)
                        - pcol.astype(jnp.int64), lp)
        ncur = jnp.where(on_node,
                         jnp.where(n_enc >= 0, n_enc, jnp.int64(-1)),
                         cur)

        sfail = do & (ns < mi)
        keep = do & ~sfail
        E = jnp.where(keep, j + 1, E)
        k = jnp.where(keep, nk, k)
        s = jnp.where(keep, ns, s)
        lp2 = jnp.where(keep, nlp, lp)
        cur2 = jnp.where(keep, ncur, cur)
        if merge_p3:
            ds = ds | sfail
            fire = (do & ~f3s & (ns < p3_max_intv)
                    & ((t + 1) >= p3_stop))
            f3s = f3s | fire
            f3E = jnp.where(fire, j, f3E)
            f3k = jnp.where(fire, nk, f3k)
            f3v = jnp.where(fire, ns, f3v)
        return (keep, t + 1, E, cur2, k, s, lp2, ds, f3s, f3E, f3k, f3v)

    st = (active, jnp.int32(1), E, cur, k, s, leaf_pos, died_s,
          f3_s, f3_E, f3_k, f3_ss)
    (_, _, E, cur, k, s, leaf_pos, died_s, f3_s, f3_E, f3_k, f3_ss) = \
        jax.lax.while_loop(cond, body, st)
    out = dict(E=E, k=k, l=jnp.zeros_like(k), s=s, valid=base_ok)
    if merge_p3:
        out.update(f3_s=f3_s, f3_E=f3_E, f3_k=f3_k,
                   f3_l=jnp.zeros_like(f3_k), f3_ss=f3_ss,
                   died_s=died_s)
    return out


class _ErtAsFmi:
    """Adapter so smems_seed_strategy_merged (which only consults
    count[] and pos_dtype) works on ERT sweeps."""

    def __init__(self, ert: DeviceErt, pos_dtype):
        self.count = ert.count.astype(pos_dtype)
        self.pos_dtype = pos_dtype


def collect_smems_ert(ert: DeviceErt, ref, codes, lens, *,
                      min_seed_len: int, split_len: int,
                      split_width: int, max_mem_intv: int,
                      max_out: int = None, pos_dtype=jnp.int64,
                      seq_len: int = None):
    """ERT-mode mem_collect_smem: same contract as
    smem.collect_smems_device (l emitted as 0). `seq_len` = true fw+rc
    length (2*l_pac), bounding leaf walks short of any ref padding."""
    B, L = codes.shape
    M = max_out or L
    ones = jnp.ones((B,), dtype=jnp.int32)
    merge = max_mem_intv > 0
    ext = ert_extend_all_positions(
        ert, ref, codes, lens, ones, check_initial=True,
        p3_max_intv=max_mem_intv if merge else 0,
        p3_stop=(min_seed_len + 1) if merge else 0,
        pos_dtype=pos_dtype, seq_len=seq_len)
    E = ext["E"]
    pcol = jnp.arange(L, dtype=jnp.int32)[None, :]
    E_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), E[:, :-1]], axis=1)
    left_max = (pcol == 0) | (E_prev < E)
    mask = left_max & ((E - pcol) >= min_seed_len)
    p1 = _emit_compact(mask, pcol * jnp.ones((B, 1), jnp.int32),
                       E - 1, ext["k"], ext["l"], ext["s"],
                       SmemBuf.empty(B, M, pos_dtype))

    # pass 2: re-seed tasks through the same trie walk
    M1 = p1.m.shape[1]
    valid = jnp.arange(M1)[None, :] < p1.cnt[:, None]
    cand = (valid & ((p1.n + 1 - p1.m) >= split_len)
            & (p1.s <= split_width))
    flat = cand.reshape(B * M1)
    TB = 2 * B         # same reseed-task budget as smems_reseed
    flat_idx = jnp.arange(B * M1, dtype=jnp.int32)
    key = jnp.where(flat, flat_idx, jnp.int32(1 << 30))
    order = jnp.argsort(key)[:TB].astype(jnp.int32)
    t_valid = jnp.take(key, order) < (1 << 30)
    # per-read reseed-task overflow (see smems_reseed): saturate the
    # final count so the aligner's retry machinery re-runs the read
    rank = jnp.cumsum(flat, dtype=jnp.int32) - 1
    reseed_of = jnp.any((flat & (rank >= TB)).reshape(B, M1), axis=1)
    t_read = (order // M1).astype(jnp.int32)
    t_slot = order % M1
    t_m = p1.m[t_read, t_slot]
    t_n = p1.n[t_read, t_slot]
    t_s = p1.s[t_read, t_slot]
    t_x = ((t_n + 1 + t_m) >> 1).astype(jnp.int32)
    t_min_intv = jnp.where(t_valid, t_s + 1, jnp.asarray(1, t_s.dtype))
    codes_t = jnp.where(t_valid[:, None], codes[t_read], jnp.int32(4))
    lens_t = jnp.where(t_valid, lens[t_read], 0)
    ext2 = ert_extend_all_positions(
        ert, ref, codes_t, lens_t, t_min_intv.astype(jnp.int32),
        check_initial=True, pos_dtype=pos_dtype, seq_len=seq_len)
    E2 = ext2["E"]
    T = codes_t.shape[0]
    E2_prev = jnp.concatenate(
        [jnp.zeros((T, 1), jnp.int32), E2[:, :-1]], axis=1)
    left_max2 = (pcol == 0) | (E2_prev < E2)
    mask2 = (t_valid[:, None] & left_max2
             & (pcol <= t_x[:, None]) & (E2 > t_x[:, None])
             & ((E2 - pcol) >= min_seed_len))
    p2 = _emit_compact(mask2, pcol * jnp.ones((T, 1), jnp.int32),
                       E2 - 1, ext2["k"], ext2["l"], ext2["s"],
                       SmemBuf.empty(B, M, pos_dtype), rows=t_read)

    parts = [p1, p2]
    if merge:
        fmi_like = _ErtAsFmi(ert, pos_dtype)
        parts.append(smems_seed_strategy_merged(
            fmi_like, codes, lens, ext, max_mem_intv,
            min_seed_len + 1, M))
    combined = concat_smems(*parts)
    valid_all = jnp.concatenate(
        [jnp.arange(b.m.shape[1])[None, :] < b.cnt[:, None]
         for b in parts], axis=1)
    keyf = ((combined.m.astype(jnp.int64) << 32)
            | combined.n.astype(jnp.int64))
    keyf = jnp.where(valid_all, keyf, jnp.int64(2 ** 62))
    order_f = jnp.argsort(keyf, axis=1)
    take = lambda arr: jnp.take_along_axis(arr, order_f, axis=1)
    cnt = jnp.where(reseed_of, combined.m.shape[1], combined.cnt)
    return SmemBuf(take(combined.m), take(combined.n), take(combined.k),
                   take(combined.l), take(combined.s), cnt)
