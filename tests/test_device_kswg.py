"""Device global-alignment kernel vs the ksw_global oracle."""

import numpy as np
import jax.numpy as jnp

from bwa_mem_scale_tpu.config import MemOptions
from bwa_mem_scale_tpu.ref.ksw import ksw_global
from bwa_mem_scale_tpu.ops.kswg import ksw_global_batch, rle_cigar


def test_kswg_matches_oracle():
    opt = MemOptions()
    rng = np.random.RandomState(99)
    pairs = []
    for _ in range(40):
        qlen = rng.randint(5, 120)
        q = rng.randint(0, 4, qlen).astype(np.int32)
        t = q.copy()
        for _ in range(rng.binomial(qlen, 0.06)):
            p = rng.randint(0, len(t))
            op = rng.randint(3)
            if op == 0:
                t[p] = (t[p] + rng.randint(1, 4)) % 4
            elif op == 1 and len(t) > 3:
                t = np.delete(t, p)
            else:
                t = np.insert(t, p, rng.randint(0, 4))
        w = max(abs(len(t) - len(q)) + 3, rng.randint(3, 30))
        pairs.append((q, t.astype(np.int32), w))

    P = len(pairs)
    QL = max(len(q) for q, _, _ in pairs)
    TL = max(len(t) for _, t, _ in pairs)
    qs = np.zeros((P, QL), np.int32)
    ts = np.zeros((P, TL), np.int32)
    qlens = np.array([len(q) for q, _, _ in pairs], np.int32)
    tlens = np.array([len(t) for _, t, _ in pairs], np.int32)
    ws = np.array([w for _, _, w in pairs], np.int32)
    for i, (q, t, _) in enumerate(pairs):
        qs[i, : len(q)] = q
        ts[i, : len(t)] = t

    res = ksw_global_batch(jnp.asarray(qs), jnp.asarray(qlens),
                           jnp.asarray(ts), jnp.asarray(tlens),
                           jnp.asarray(ws), opt.o_del, opt.e_del,
                           opt.o_ins, opt.e_ins, opt.mat)
    score = np.asarray(res.score)
    ops = np.asarray(res.ops)
    n_ops = np.asarray(res.n_ops)
    tdel = np.asarray(res.tail_del)
    tins = np.asarray(res.tail_ins)

    for i, (q, t, w) in enumerate(pairs):
        want_score, want_cigar = ksw_global(q, t, opt.mat, opt.o_del,
                                            opt.e_del, opt.o_ins,
                                            opt.e_ins, w)
        assert score[i] == want_score, f"pair {i}"
        got_cigar = rle_cigar(ops[i], int(n_ops[i]), int(tdel[i]),
                              int(tins[i]))
        assert got_cigar == want_cigar, \
            f"pair {i}: {got_cigar} != {want_cigar}"
