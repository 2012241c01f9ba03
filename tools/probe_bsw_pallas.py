"""Chip A/B: Pallas BSW vs jnp BSW at bench shapes.

Axon-tunnel-safe timing: value-fetch sync, varied inputs.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bwa_mem_scale_tpu.ops.bsw import banded_swa_batch
from bwa_mem_scale_tpu.ops.bsw_pallas import banded_swa_batch_pallas

P = int(os.environ.get("P", 16384))
QL, TL = 101, 309
mat = np.full((5, 5), -4, np.int32); np.fill_diagonal(mat, 1)
mat[4, :] = -1; mat[:, 4] = -1
rng = np.random.default_rng(int(time.time()))

def mkbatch(seed):
    r = np.random.default_rng(seed)
    qs = r.integers(0, 4, (P, QL)).astype(np.int32)
    ts = r.integers(0, 4, (P, TL)).astype(np.int32)
    # 70% of pairs: target = query + noise (real extensions)
    n_real = int(0.7 * P)
    ts[:n_real, :QL] = qs[:n_real]
    noise = r.random((n_real, QL)) < 0.02
    ts[:n_real, :QL] = np.where(noise, r.integers(0, 4, (n_real, QL)), ts[:n_real, :QL])
    q_lens = r.integers(20, QL + 1, P).astype(np.int32)
    t_lens = np.minimum(q_lens + r.integers(0, 200, P), TL).astype(np.int32)
    # 25% dead lanes (masked pairs, as in the real pipeline)
    dead = r.random(P) < 0.25
    q_lens[dead] = 0; t_lens[dead] = 0
    h0 = r.integers(19, 60, P).astype(np.int32)
    return (jnp.asarray(qs), jnp.asarray(q_lens), jnp.asarray(ts),
            jnp.asarray(t_lens), jnp.asarray(h0))

fns = {
    "jnp": jax.jit(lambda *a: banded_swa_batch(*a, 100, 6, 1, 6, 1, 100, mat)),
}
for bp in (256, 512):
    fns[f"pallas{bp}"] = jax.jit(
        lambda *a, bp=bp: banded_swa_batch_pallas(*a, 100, 6, 1, 6, 1, 100, mat, block=bp))

batches = [mkbatch(1000 + i) for i in range(4)]
ref = None
for name, fn in fns.items():
    try:
        out = fn(*batches[0])
        got = np.stack([np.asarray(x) for x in out])
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}")
        continue
    if ref is None:
        ref = got
    else:
        eq = (ref == got).all()
        print(f"{name}: bit-equal to jnp: {eq}")
        if not eq:
            bad = np.argwhere(ref != got)[:5]
            print("  mismatches:", bad, ref[tuple(bad.T)], got[tuple(bad.T)])
    t0 = time.time()
    for b in batches[1:]:
        np.asarray(fn(*b)[0])
    dt = (time.time() - t0) / (len(batches) - 1)
    print(f"{name}: {dt*1000:.1f} ms/call")
