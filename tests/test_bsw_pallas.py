"""Pallas BSW kernel vs the jnp kernel (bit-equality).

Runs the Mosaic kernel in interpret mode so the CPU suite covers its
semantics; the chip probe (tools/probe_bsw_pallas.py) covers the real
lowering. Spec for both: the reference's scalarBandedSWA
(src/bandedSWA.cpp:116-238) via the repo's scalar oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.ops.bsw import banded_swa_batch
from bwa_mem_scale_tpu.ops.bsw_pallas import banded_swa_batch_pallas


def _mat():
    mat = np.full((5, 5), -4, np.int32)
    np.fill_diagonal(mat, 1)
    mat[4, :] = -1
    mat[:, 4] = -1
    return mat


@pytest.mark.parametrize("seed", [0, 7])
def test_bsw_pallas_interpret_bit_equal(seed):
    P, QL, TL = 64, 33, 57
    r = np.random.default_rng(seed)
    qs = r.integers(0, 4, (P, QL)).astype(np.int32)
    ts = r.integers(0, 4, (P, TL)).astype(np.int32)
    n_real = P // 2
    ts[:n_real, :QL] = qs[:n_real]
    flip = r.random((n_real, QL)) < 0.05
    ts[:n_real, :QL] = np.where(
        flip, r.integers(0, 4, (n_real, QL)), ts[:n_real, :QL])
    q_lens = r.integers(5, QL + 1, P).astype(np.int32)
    t_lens = np.minimum(q_lens + r.integers(0, 30, P), TL).astype(np.int32)
    dead = r.random(P) < 0.2
    q_lens[dead] = 0
    t_lens[dead] = 0
    h0 = r.integers(5, 30, P).astype(np.int32)

    args = (jnp.asarray(qs), jnp.asarray(q_lens), jnp.asarray(ts),
            jnp.asarray(t_lens), jnp.asarray(h0))
    ref = banded_swa_batch(*args, 12, 6, 1, 6, 1, 100, _mat())
    got = banded_swa_batch_pallas(*args, 12, 6, 1, 6, 1, 100, _mat(),
                                  block=32, interpret=True)
    for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), f)
