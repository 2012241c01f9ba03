"""Device FM-index: batched occ counting and backward extension.

The TPU-native formulation of the reference's GET_OCC/backwardExt hot
loop (src/FMI_search.h:76-83, src/FMI_search.cpp:2029-2056): the
checkpointed BWT lives in HBM as
    cp_count [nblocks, 4]  (int32/int64)  exclusive base counts
    cp_mask  [nblocks, 4]  (uint32)       one-hot 32-bp block bitmasks
and occ(p, c) for a batch of positions is one row gather plus a masked
population count — pure VPU work over thousands of lanes.

All functions are shape-polymorphic over a leading batch shape and are
designed to be called inside jit/while_loop bodies.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..index.artifacts import FMIndex, CP_SHIFT, CP_MASK


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceFMIndex:
    """FM-index arrays resident on device.

    For int32-position genomes, the checkpoint counts and bitmasks are
    fused into one [nb, 8] int32 table so each occ(p, *) is a single
    row gather (row gathers are the dominant cost of the seeding
    sweeps on TPU — the analogue of the reference packing CP_OCC into
    one cache line, src/FMI_search.h:64-68)."""

    count: jax.Array        # [5] pos_dtype
    cp_fused: jax.Array     # [nb, 8] int32 (counts | bitcast masks),
                            # or None for int64 genomes
    cp_count: jax.Array     # [nb, 4] pos_dtype (int64 path)
    cp_mask: jax.Array      # [nb, 4] uint32    (int64 path)
    sa_samples: jax.Array   # [ns] pos_dtype
    sentinel_index: jax.Array  # scalar pos_dtype
    ref: jax.Array          # [2*l_pac] uint8 fw+rc byte reference
    # static metadata
    sa_compx: int
    l_pac: int
    seq_len: int

    @property
    def pos_dtype(self):
        return self.count.dtype

    def tree_flatten(self):
        children = (self.count, self.cp_fused, self.cp_count,
                    self.cp_mask, self.sa_samples, self.sentinel_index,
                    self.ref)
        aux = (self.sa_compx, self.l_pac, self.seq_len)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, idx: FMIndex, force_int64: bool = False
                  ) -> "DeviceFMIndex":
        pos_dtype = (np.int64 if (force_int64 or not idx.pos_fits_int32)
                     else np.int32)
        if pos_dtype == np.int32:
            fused = np.concatenate(
                [idx.cp_count.astype(np.int32),
                 idx.cp_mask.view(np.int32).reshape(-1, 4)],
                axis=1)
            cp_fused = jnp.asarray(fused)
            cp_count = None
            cp_mask = None
        else:
            cp_fused = None
            cp_count = jnp.asarray(idx.cp_count, dtype=pos_dtype)
            cp_mask = jnp.asarray(idx.cp_mask)
        return cls(
            count=jnp.asarray(idx.count, dtype=pos_dtype),
            cp_fused=cp_fused,
            cp_count=cp_count,
            cp_mask=cp_mask,
            sa_samples=jnp.asarray(idx.sa_samples, dtype=pos_dtype),
            sentinel_index=jnp.asarray(idx.sentinel_index, dtype=pos_dtype),
            ref=jnp.asarray(idx.ref_string),
            sa_compx=idx.sa_compx,
            l_pac=idx.bns.l_pac,
            seq_len=idx.seq_len,
        )


def occ_all4(fmi: DeviceFMIndex, pp: jax.Array) -> jax.Array:
    """occ(pp, c) for all four bases. pp [...], returns [..., 4]."""
    block = (pp >> CP_SHIFT).astype(jnp.int32)
    y = (pp & CP_MASK).astype(jnp.uint32)
    if fmi.cp_fused is not None:
        row = fmi.cp_fused[block]              # [..., 8] one gather
        counts = row[..., :4]
        masks = jax.lax.bitcast_convert_type(row[..., 4:], jnp.uint32)
    else:
        counts = fmi.cp_count[block]           # [..., 4]
        masks = fmi.cp_mask[block]             # [..., 4] uint32
    # Top-y-bits mask; y == 0 -> 0.
    top = (~(jnp.uint32(0xFFFFFFFF) >> y)).astype(jnp.uint32)
    hit = masks & top[..., None]
    pc = jax.lax.population_count(hit).astype(fmi.pos_dtype)
    return counts + pc


def backward_ext_all4(fmi: DeviceFMIndex, k, l, s):
    """Backward extension of intervals (k, l, s) by every base.

    Returns (k4, l4, s4) each [..., 4], matching the reference's
    backwardExt including sentinel correction (FMI_search.cpp:2029-2056).
    """
    occ_sp = occ_all4(fmi, k)
    occ_ep = occ_all4(fmi, k + s)
    k4 = fmi.count[:4] + occ_sp
    s4 = occ_ep - occ_sp
    sent = ((k <= fmi.sentinel_index)
            & (k + s > fmi.sentinel_index)).astype(fmi.pos_dtype)
    l3 = l + sent
    l2 = l3 + s4[..., 3]
    l1 = l2 + s4[..., 2]
    l0 = l1 + s4[..., 1]
    l4 = jnp.stack([l0, l1, l2, l3], axis=-1)
    return k4, l4, s4


def backward_ext(fmi: DeviceFMIndex, k, l, s, a):
    """Backward extension by base a [...] (values 0..3)."""
    k4, l4, s4 = backward_ext_all4(fmi, k, l, s)
    a_ = a[..., None].astype(jnp.int32)
    take = lambda v: jnp.take_along_axis(v, a_, axis=-1)[..., 0]
    return take(k4), take(l4), take(s4)


def forward_ext(fmi: DeviceFMIndex, k, l, s, a):
    """Forward extension = backward extension on the RC BWT via k/l swap
    and base complement (FMI_search.cpp:1477-1484)."""
    k2, l2, s2 = backward_ext(fmi, l, k, s, 3 - a)
    return l2, k2, s2


def _row_at(fmi: DeviceFMIndex, block):
    if fmi.cp_fused is not None:
        row = fmi.cp_fused[block]
        return row[..., :4], jax.lax.bitcast_convert_type(row[..., 4:],
                                                          jnp.uint32)
    return fmi.cp_count[block], fmi.cp_mask[block]


def bwt_base_at(fmi: DeviceFMIndex, pos: jax.Array) -> jax.Array:
    """Base code of BWT[pos] ([...] int32); 4 at the sentinel row."""
    block = (pos >> CP_SHIFT).astype(jnp.int32)
    y = (31 - (pos & CP_MASK)).astype(jnp.uint32)
    _, masks = _row_at(fmi, block)
    bits = (masks >> y[..., None]) & jnp.uint32(1)   # [..., 4]
    b = jnp.argmax(bits, axis=-1).astype(jnp.int32)
    none = jnp.sum(bits, axis=-1) == 0
    return jnp.where(none, 4, b)


def occ_and_base(fmi: DeviceFMIndex, pos: jax.Array):
    """(occ(pos, c) for all c, BWT[pos]) with ONE checkpoint-row gather
    — the LF-step fast path for SA resolution."""
    block = (pos >> CP_SHIFT).astype(jnp.int32)
    counts, masks = _row_at(fmi, block)
    y = (pos & CP_MASK).astype(jnp.uint32)
    top = (~(jnp.uint32(0xFFFFFFFF) >> y)).astype(jnp.uint32)
    pc = jax.lax.population_count(masks & top[..., None])
    occs = counts + pc.astype(fmi.pos_dtype)
    yb = (jnp.uint32(31) - y)
    bits = (masks >> yb[..., None]) & jnp.uint32(1)
    b = jnp.argmax(bits, axis=-1).astype(jnp.int32)
    b = jnp.where(jnp.sum(bits, axis=-1) == 0, 4, b)
    return occs, b
