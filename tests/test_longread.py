"""Long-read regime: -x presets, the seed-SW filter gate, and the
driver's oracle routing (mem_flt_chained_seeds, src/bwamem.cpp:494-526
and the -x presets, src/fastmap.cpp:1129-1169)."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from bwa_mem_scale_tpu.config import MemOptions, needs_seed_sw_filter
from bwa_mem_scale_tpu.cli import _opts_from_args, _add_mem_opts

from conftest import make_genome


def _parse(argv):
    import argparse
    p = argparse.ArgumentParser(add_help=False)
    _add_mem_opts(p)
    return p.parse_args(argv)


def test_preset_pacbio():
    o = _opts_from_args(_parse(["-x", "pacbio"]))
    assert (o.o_del, o.e_del, o.o_ins, o.e_ins) == (1, 1, 1, 1)
    assert o.b == 1
    assert o.min_seed_len == 17
    assert o.min_chain_weight == 40
    assert o.split_factor == 10.0
    assert (o.pen_clip5, o.pen_clip3) == (0, 0)


def test_preset_ont2d_with_override():
    o = _opts_from_args(_parse(["-x", "ont2d", "-k", "12"]))
    assert o.min_seed_len == 12          # explicit -k beats preset
    assert o.min_chain_weight == 20
    assert o.b == 1


def test_preset_intractg():
    o = _opts_from_args(_parse(["-x", "intractg"]))
    assert (o.o_del, o.o_ins) == (16, 16)
    assert o.b == 9
    assert (o.pen_clip5, o.pen_clip3) == (5, 5)


def test_update_a_rescaling():
    o = _opts_from_args(_parse(["-A", "2"]))
    assert o.b == 8 and o.T == 60
    assert (o.o_del, o.e_del) == (12, 2)
    assert o.zdrop == 200 and o.pen_unpaired == 34
    # explicit -B is not rescaled
    o = _opts_from_args(_parse(["-A", "2", "-B", "5"]))
    assert o.b == 5


def test_seed_sw_gate():
    opt = MemOptions()
    assert not needs_seed_sw_filter(opt, 151)
    assert not needs_seed_sw_filter(opt, 500)
    assert needs_seed_sw_filter(opt, 1200)
    opt.min_chain_weight = 20            # ont2d
    assert not needs_seed_sw_filter(opt, 300)
    assert needs_seed_sw_filter(opt, 1200)


def test_driver_routes_long_reads(small_index):
    """Mixed batch: short reads stream through the device path, a
    long (1.2 kbp) read goes through the oracle with the seed-SW
    filter; all must map back to their simulated origin."""
    from bwa_mem_scale_tpu.pipeline.align import TpuAligner
    from bwa_mem_scale_tpu.pipeline.driver import run_alignment
    import tempfile, os

    bns = small_index.bns
    rng = np.random.RandomState(11)
    g = bns.seq
    reads = []
    # 6 short reads
    for i in range(6):
        p = rng.randint(0, len(g) - 100)
        s = g[p: p + 100].astype(np.uint8).copy()
        s[rng.rand(100) < 0.01] = rng.randint(0, 4)
        reads.append((f"s{i}", s, p))
    # 2 long reads with a couple of errors
    for i in range(2):
        p = rng.randint(0, len(g) - 1200)
        s = g[p: p + 1200].astype(np.uint8).copy()
        s[rng.rand(1200) < 0.01] = rng.randint(0, 4)
        reads.append((f"l{i}", s, p))

    bases = "ACGT"
    with tempfile.TemporaryDirectory() as d:
        fq = os.path.join(d, "r.fq")
        with open(fq, "w") as f:
            for name, s, _ in reads:
                txt = "".join(bases[c] for c in s)
                f.write(f"@{name}\n{txt}\n+\n{'I' * len(s)}\n")
        aligner = TpuAligner(small_index, MemOptions())
        out = io.StringIO()
        n = run_alignment(aligner, [fq], out, batch_reads=8)
        assert n == len(reads)
    by_name = {}
    for ln in out.getvalue().splitlines():
        if ln.startswith("@"):
            continue
        f = ln.split("\t")
        if int(f[1]) & 0x900:
            continue
        by_name[f[0]] = f
    for name, s, p in reads:
        f = by_name[name]
        assert f[2] != "*", name
        # position within a few bp of the simulated origin (offset
        # inside the contig, fw or rc)
        pos = int(f[3]) - 1
        off = bns.anns[0].offset
        assert abs(pos - (p - off)) < 30 or \
            abs(pos - (p - off)) < len(s) + 30, (name, pos, p)
