"""Batched suffix-array lookup (SAL) on device.

TPU-native form of the reference's compressed SA resolution
(get_sa_entry_compressed / get_sa_entries_prefetch,
src/FMI_search.cpp:2107-2379): every SMEM's SA interval is sampled into
at most max_occ coordinates; non-sampled rows are recovered by a
batched LF-walk (at most 2^sa_compx - 1 steps, each one occ gather for
the whole coordinate batch). The reference hides the walk's memory
latency with 20-wide software prefetch pipelines; here the batch *is*
the pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .occ import (DeviceFMIndex, occ_b_and_base, sa_sample_at,
                  _take_c)
from .smem import SmemBuf


def sa_lookup(fmi: DeviceFMIndex, pos: jax.Array, valid: jax.Array
              ) -> jax.Array:
    """Resolve SA[pos] for a batch of BWT row indices.

    pos [...], valid [...] bool (invalid lanes return 0).

    The LF walk is GEOMETRIC: a lane finds a sampled row with
    p = 1/2^sa_compx per step (the walk visits pseudo-random rows),
    so the mean walk is 2^sa_compx but the slowest of N lanes runs
    ~2^sa_compx * ln(N) steps — a lockstep machine wastes >90% of its
    lane-ticks in that tail at batch widths (hg38 probe: 11 s for 2M
    lanes). Staged narrowing (the seeding machines' fix) compacts
    retired lanes out at halving width thresholds; 1-D state rows
    make each stage a handful of cheap per-element gathers/scatters."""
    compx_mask = (1 << fmi.sa_compx) - 1
    pos_dtype = fmi.pos_dtype
    if fmi.sa_compx == 0:
        # full SA resident (memory-for-speed knob, like the
        # reference's SA_COMPX build parameter): single gather.
        out = sa_sample_at(fmi, pos.astype(jnp.int64))
        return jnp.where(valid, out, 0)

    shape = pos.shape
    N = 1
    for d in shape:
        N *= d

    def body(st):
        sp, offset, active, done_val, orow = st
        sampled = (sp & compx_mask) == 0
        take_sample = active & sampled
        samp = sa_sample_at(fmi, (sp >> fmi.sa_compx).astype(jnp.int64))
        done_val = jnp.where(take_sample, samp + offset, done_val)
        active = active & ~sampled
        # LF step: one fused row gather gives both occ(sp, b) and
        # b = BWT[sp]; occ_b_and_base popcounts only the one mask
        # and selects count words before widening to int64.
        occ_b, b = occ_b_and_base(fmi, sp)
        hit_sentinel = active & (b == 4)
        done_val = jnp.where(hit_sentinel, offset, done_val)
        active = active & ~hit_sentinel
        # one-hot selects (not gathers): XLA TPU lowers per-lane
        # indexed gathers to a ~4-10 ns/row serial loop; at [B, C]
        # widths that is ms-class per LF step (probe_loop_cost.py)
        bc = jnp.clip(b, 0, 3)
        cnt_b = _take_c(fmi.count[:4], bc)
        sp_new = cnt_b + occ_b
        sp = jnp.where(active, sp_new, sp)
        offset = offset + active.astype(pos_dtype)
        return sp, offset, active, done_val, orow

    import os
    stages_env = os.environ.get("BWATPU_SAL_STAGES", "auto")
    if stages_env == "0":
        widths = []
    elif stages_env == "auto":
        widths = []
        w = N // 2
        while w >= 16384:
            widths.append(w)
            w //= 2
    else:
        # explicit comma-separated width schedule (like
        # BWATPU_SEED_STAGES) — lets small-N tests exercise the
        # compaction/flush/orow-scatter path
        widths = [int(w) for w in stages_env.split(",")
                  if 0 < int(w) < N]

    sp = pos.reshape(N).astype(pos_dtype)
    offset = jnp.zeros(N, pos_dtype)
    active = valid.reshape(N)
    done_val = jnp.zeros(N, pos_dtype)
    orow = jnp.arange(N, dtype=jnp.int32)
    glob = jnp.zeros(N, pos_dtype)
    st = (sp, offset, active, done_val, orow)
    for W2 in widths:
        st = jax.lax.while_loop(
            lambda s, W2=W2: jnp.sum(s[2]) > W2, body, st)
        sp, offset, active, done_val, orow = st
        rows = jnp.where(active, N, orow)   # retired lanes flush
        glob = glob.at[rows].set(done_val, mode="drop")
        from .smem import compact_indices
        perm, keep = compact_indices(active, W2)
        # padding lanes (beyond the live count) get orow = N so their
        # garbage drops at every later scatter
        st = (sp[perm], offset[perm], keep,
              done_val[perm], jnp.where(keep, orow[perm], N))
    st = jax.lax.while_loop(lambda s: jnp.any(s[2]), body, st)
    _, _, _, done_val, orow = st
    glob = glob.at[orow].set(done_val, mode="drop")
    return glob.reshape(shape)


def expand_and_lookup(fmi: DeviceFMIndex, smems: SmemBuf, max_occ: int,
                      max_coords: int):
    """Sample each SMEM interval and resolve coordinates.

    Returns (rbeg [B, C], seed_smem [B, C] (index into smems arrays),
    coord_valid [B, C], total [B], overflow [B]) where C = max_coords.
    Within a read, coordinates appear in SMEM order then interval order
    — the same order the reference feeds seeds into chaining
    (mem_chain_seeds, src/bwamem.cpp:862-895). `overflow` marks reads
    whose sampled coordinates exceeded the max_coords capacity (the
    reference's heap-backed seed vector never drops seeds,
    src/bwamem.cpp:789-895 — overflowed reads must be retried at a
    larger shape).
    """
    B, M = smems.m.shape
    valid = jnp.arange(M)[None, :] < smems.cnt[:, None]
    s = smems.s
    big = s > max_occ
    step = jnp.where(big, s // max_occ, 1).astype(s.dtype)
    # number of sampled coordinates per SMEM
    n_i = jnp.where(big,
                    jnp.minimum((s + step - 1) // step, max_occ),
                    jnp.minimum(s, max_occ))
    n_i = jnp.where(valid, n_i, 0).astype(jnp.int32)
    csum = jnp.cumsum(n_i, axis=1)
    overflow = csum[:, -1] > max_coords
    total = jnp.minimum(csum[:, -1], max_coords)
    starts = csum - n_i                          # [B, M]

    slot = jnp.arange(max_coords)[None, :]       # [1, C]
    coord_valid = slot < total[:, None]
    # Which SMEM does each slot belong to? Scatter each (nonzero)
    # SMEM's index at its start slot and forward-fill with a running
    # max — one scatter + cummax instead of a vmapped binary search
    # (searchsorted measured 0.22 s/batch on TPU at [4096, 256]).
    # Starts of nonzero SMEMs are strictly increasing, so max+fill
    # reproduces searchsorted(csum, slot, side="right") exactly on
    # the slots that coord_valid keeps.
    ii = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    tgt = jnp.where(n_i > 0, starts, max_coords)   # OOB rows drop
    mark = jnp.full((B, max_coords), -1, jnp.int32)
    mark = mark.at[jnp.arange(B)[:, None], tgt].max(ii, mode="drop")
    seed_idx = jax.lax.cummax(mark, axis=1)
    seed_idx = jnp.clip(seed_idx, 0, M - 1)
    bidx = jnp.arange(B)[:, None]
    within = slot - starts[bidx, seed_idx]
    pos = (smems.k[bidx, seed_idx]
           + within.astype(s.dtype) * step[bidx, seed_idx])
    rbeg = sa_lookup(fmi, pos, coord_valid)
    return rbeg, seed_idx, coord_valid, total, overflow
