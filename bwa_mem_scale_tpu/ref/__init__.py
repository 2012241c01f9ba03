"""Pure-NumPy oracle implementations of the alignment pipeline.

These encode the exact semantics of the reference's scalar code paths
(cited per-function) and serve two purposes:

1. the executable specification that every JAX/Pallas device kernel in
   ``ops/`` is unit-tested against, and
2. a slow-but-complete fallback pipeline for debugging.

Nothing in here is performance-relevant; clarity and bit-exactness win.
"""
