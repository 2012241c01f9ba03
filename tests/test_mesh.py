"""Read-axis sharding over a virtual 8-device mesh must reproduce the
unsharded extend results exactly — including global read indices in
the packed output matrix (column 1 is shard-local before the
globalization in parallel/mesh.local_step)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.pipeline.align import (PipelineConfig,
                                              seed_chain_extend)
from bwa_mem_scale_tpu.models.aligner import (build_demo_aligner,
                                              simulate_reads)
from bwa_mem_scale_tpu.parallel.mesh import make_mesh, sharded_align_fn


def _regions_by_read(packed):
    out = {}
    for row in np.asarray(packed).reshape(-1, packed.shape[-1]):
        if not row[0]:
            continue
        rb = (int(row[11]) << 31) | int(row[10])
        re = (int(row[13]) << 31) | int(row[12])
        out.setdefault(int(row[1]), []).append(
            (int(row[2]), int(row[3]), int(row[4]), rb, re))
    return {k: sorted(v) for k, v in out.items()}


def test_sharded_extend_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    opt = MemOptions()
    cfg = PipelineConfig(max_coords=64, max_chains=8,
                        max_seeds_per_chain=8, max_regs=8)
    aligner = build_demo_aligner(genome_bp=12000, opt=opt, cfg=cfg)
    L = 64
    B = 16
    codes, lens = simulate_reads(aligner.idx.bns, B, L, err_rate=0.02)
    codes = jnp.asarray(np.asarray(codes, np.int32))
    lens = jnp.asarray(np.asarray(lens, np.int32))

    mesh = make_mesh(8)
    fn = sharded_align_fn(mesh, opt, cfg, L)
    out = fn(aligner.fmi, aligner.dbns, codes, lens)
    got = _regions_by_read(np.asarray(out["packed"]))

    ref = jax.jit(lambda f, d, c, l: seed_chain_extend(
        f, d, c, l, L=L, opt=opt, cfg=cfg, fma=None, ert=None))(
        aligner.fmi, aligner.dbns, codes, lens)
    want = _regions_by_read(np.asarray(ref["packed"]))
    assert got == want
