import os
import sys

# Tests run on CPU with 8 virtual devices so multi-chip sharding paths
# compile and execute without TPU hardware.
# Force CPU through jax.config, not the environment: this container's
# site setup rewrites jax_platforms to "axon,cpu" (the real-TPU
# tunnel) AFTER env processing, which silently ran the whole suite on
# one remote TPU device and skipped every multi-device path. The
# config update below wins over that, and jax_num_cpu_devices is the
# mechanism this jax actually honors for virtual devices
# (--xla_force_host_platform_device_count is ignored).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: the suite's wall time is dominated by
# re-compiling the same machine/pipeline HLO every run (VERDICT r2
# item 9). Cache survives across runs in the repo's .jax_cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from bwa_mem_scale_tpu.index.bntseq import BntSeq, Annotation, decode_bases
from bwa_mem_scale_tpu.index.build import build_index


def make_genome(n: int, seed: int = 0, n_contigs: int = 1) -> BntSeq:
    rng = np.random.RandomState(seed)
    seq = rng.randint(0, 4, size=n).astype(np.uint8)
    anns = []
    per = n // n_contigs
    off = 0
    for i in range(n_contigs):
        ln = per if i < n_contigs - 1 else n - off
        anns.append(Annotation(name=f"ctg{i}", anno="(null)", offset=off,
                               length=ln, n_ambs=0))
        off += ln
    return BntSeq(l_pac=n, anns=anns, ambs=[], seq=seq)


def sample_reads(bns: BntSeq, n_reads: int, read_len: int, seed: int = 1,
                 err_rate: float = 0.0, indel_rate: float = 0.0):
    """Simulate reads with known true positions. Returns list of
    (codes, true_pos, is_rev)."""
    rng = np.random.RandomState(seed)
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    out = []
    for _ in range(n_reads):
        pos = rng.randint(0, bns.l_pac - read_len)
        frag = bns.seq[pos: pos + read_len].copy()
        is_rev = bool(rng.randint(2))
        if is_rev:
            frag = comp[frag[::-1]]
        if err_rate > 0:
            err = rng.rand(read_len) < err_rate
            frag[err] = (frag[err] + rng.randint(1, 4, size=err.sum())) % 4
        out.append((frag.astype(np.uint8), pos, is_rev))
    return out


@pytest.fixture(scope="session")
def small_genome():
    return make_genome(20000, seed=42)


@pytest.fixture(scope="session")
def small_index(small_genome):
    return build_index(small_genome)
