"""Device banded-SW batch kernel vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ref.bsw import scalar_banded_swa
from bwa_mem_scale_tpu.ops.bsw import banded_swa_batch


def _random_pairs(rng, n, qmax=100, tmax=200, mut=0.05):
    """Extension-like pairs: target contains a mutated copy of query."""
    pairs = []
    for _ in range(n):
        qlen = rng.randint(1, qmax)
        q = rng.randint(0, 4, size=qlen).astype(np.int32)
        # target = query with mutations + extra tail
        t = q.copy()
        nmut = rng.binomial(qlen, mut)
        for _ in range(nmut):
            p = rng.randint(0, len(t))
            op = rng.randint(3)
            if op == 0:
                t[p] = (t[p] + rng.randint(1, 4)) % 4
            elif op == 1 and len(t) > 2:
                t = np.delete(t, p)
            else:
                t = np.insert(t, p, rng.randint(0, 4))
        tail = rng.randint(0, tmax - len(t)) if len(t) < tmax else 0
        t = np.concatenate([t, rng.randint(0, 4, size=tail)])
        t = t[:tmax].astype(np.int32)
        pairs.append((q, t))
    return pairs


@pytest.mark.parametrize("w", [100, 10, 1])
def test_bsw_matches_oracle(w):
    opt = MemOptions()
    rng = np.random.RandomState(1234 + w)
    pairs = _random_pairs(rng, 60)
    # also adversarial: unrelated sequences, empty target
    pairs.append((rng.randint(0, 4, 30).astype(np.int32),
                  rng.randint(0, 4, 60).astype(np.int32)))
    pairs.append((rng.randint(0, 4, 10).astype(np.int32),
                  np.zeros(0, dtype=np.int32)))

    P = len(pairs)
    QL = max(len(q) for q, _ in pairs)
    TL = max(max(len(t) for _, t in pairs), 1)
    qs = np.zeros((P, QL), dtype=np.int32)
    ts = np.zeros((P, TL), dtype=np.int32)
    qlens = np.zeros(P, dtype=np.int32)
    tlens = np.zeros(P, dtype=np.int32)
    h0s = np.zeros(P, dtype=np.int32)
    for i, (q, t) in enumerate(pairs):
        qs[i, : len(q)] = q
        ts[i, : len(t)] = t
        qlens[i] = len(q)
        tlens[i] = len(t)
        h0s[i] = 19 + (i % 30)

    res = banded_swa_batch(jnp.asarray(qs), jnp.asarray(qlens),
                           jnp.asarray(ts), jnp.asarray(tlens),
                           jnp.asarray(h0s), w,
                           opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                           opt.zdrop, opt.mat)
    score, qle, tle, gtle, gscore, max_off = map(np.asarray, res)

    for i, (q, t) in enumerate(pairs):
        want = scalar_banded_swa(q, t, w, int(h0s[i]),
                                 opt.o_del, opt.e_del, opt.o_ins,
                                 opt.e_ins, opt.zdrop, opt.mat)
        got = (score[i], qle[i], tle[i], gtle[i], gscore[i], max_off[i])
        exp = (want.score, want.qle, want.tle, want.gtle, want.gscore,
               want.max_off)
        assert got == exp, f"pair {i} (q={len(q)},t={len(t)}): {got} != {exp}"


def test_bsw_zdrop_and_gscore():
    """Cases engineered to hit z-drop early exit and gscore selection."""
    opt = MemOptions()
    rng = np.random.RandomState(7)
    # long target of garbage after a good prefix -> z-drop
    q = rng.randint(0, 4, 80).astype(np.int32)
    t = np.concatenate([q[:40], (q[40:] + 2) % 4,
                        rng.randint(0, 4, 100)]).astype(np.int32)
    qs = q[None, :]
    ts = t[None, :]
    res = banded_swa_batch(jnp.asarray(qs), jnp.asarray([80]),
                           jnp.asarray(ts), jnp.asarray([len(t)]),
                           jnp.asarray([50]), opt.w,
                           opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                           opt.zdrop, opt.mat)
    want = scalar_banded_swa(q, t, opt.w, 50, opt.o_del, opt.e_del,
                             opt.o_ins, opt.e_ins, opt.zdrop, opt.mat)
    got = tuple(int(np.asarray(v)[0]) for v in res)
    assert got == (want.score, want.qle, want.tle, want.gtle,
                   want.gscore, want.max_off)
