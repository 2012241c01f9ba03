"""Characterize the axon tunnel: transfer bandwidth, fetch latency,
and whether transfers overlap with running device programs.

Run on the real chip:  python tools/probe_tunnel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def t(f):
    t0 = time.perf_counter()
    r = f()
    return time.perf_counter() - t0, r


def main():
    print(f"* devices: {jax.devices()}", file=sys.stderr)

    # A long-running device program (~1s): repeated matmul
    x = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def burn(x, n):
        def body(i, a):
            return a @ x / 2048.0
        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    # calibrate n for ~1.2 s
    burn(x, 10).block_until_ready()
    n = 10
    while True:
        dt, r = t(lambda: np.asarray(burn(x, n)))
        if dt > 1.2 or n > 100000:
            break
        n *= 4
    print(f"* burn({n}) = {dt:.2f} s")

    # 1. fetch latency: tiny array, idle device
    tiny = jnp.zeros((4,), jnp.int32) + 1
    np.asarray(tiny)
    lat = min(t(lambda: np.asarray(tiny))[0] for _ in range(5))
    print(f"tiny fetch (idle):            {lat * 1e3:8.1f} ms")

    # 2. bulk fetch bandwidth, idle device
    for mb in (1, 4):
        big = jnp.ones((mb * 1024 * 1024 // 4,), jnp.int32)
        np.asarray(big[:4])
        dt = min(t(lambda: np.asarray(big))[0] for _ in range(3))
        print(f"{mb} MB fetch (idle):           {dt * 1e3:8.1f} ms "
              f"({mb / dt:6.1f} MB/s)")

    # 3. upload bandwidth, idle device (upload + checksum to force it)
    host = np.ones(1024 * 1024, np.int32)

    @jax.jit
    def chk(a):
        return a.sum()
    np.asarray(chk(jnp.asarray(host)))
    dt = min(t(lambda: jnp.asarray(host))[0] for _ in range(3))
    print(f"4 MB upload call (idle):      {dt * 1e3:8.1f} ms "
          f"(async if tiny)")
    dt = min(t(lambda: np.asarray(chk(jnp.asarray(host))))[0]
             for _ in range(3))
    print(f"4 MB upload+chk (idle):       {dt * 1e3:8.1f} ms")

    # 4. fetch of a READY buffer while another program runs
    ready = jnp.ones((1024 * 1024 // 4,), jnp.int32) * 3  # 1 MB
    np.asarray(ready[:4])
    h = burn(x, n)             # dispatch ~1.2 s of work
    time.sleep(0.1)
    dt, _ = t(lambda: np.asarray(ready))
    print(f"1 MB fetch (busy):            {dt * 1e3:8.1f} ms "
          f"(idle was above)")
    np.asarray(h)              # drain

    # 5. tiny fetch while busy
    h = burn(x, n)
    time.sleep(0.1)
    dt, _ = t(lambda: np.asarray(tiny))
    print(f"tiny fetch (busy):            {dt * 1e3:8.1f} ms")
    np.asarray(h)

    # 6. upload while busy
    h = burn(x, n)
    time.sleep(0.1)
    dt, _ = t(lambda: jnp.asarray(host))
    print(f"4 MB upload call (busy):      {dt * 1e3:8.1f} ms")
    np.asarray(h)

    # 7. dispatch a second program while busy (queue depth)
    h = burn(x, n)
    time.sleep(0.1)
    dt, h2 = t(lambda: burn(x, 10))
    print(f"small dispatch (busy):        {dt * 1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(h2))
    print(f"  then fetch of its result:   {dt * 1e3:8.1f} ms "
          f"(~burn time if FIFO)")
    np.asarray(h)

    # 8. fetch of FIRST program's result while SECOND still runs
    h1 = burn(x, n)
    h2 = burn(x, n)
    time.sleep(0.2)
    dt, _ = t(lambda: np.asarray(h1))
    print(f"fetch prog1 (prog2 queued):   {dt * 1e3:8.1f} ms "
          f"(burn={1000 * 1.2:.0f}ms-ish if it waits for prog1 only)")
    dt, _ = t(lambda: np.asarray(h2))
    print(f"fetch prog2 after:            {dt * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
