"""Verify + time vmem_sort on the TPU against lax.sort.

Fresh time-based seeds every run (the axon server caches identical
executions ACROSS processes, so fixed-seed timing lies). Position-weighted
checksums force real work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.sort_vmem import vmem_sort


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(step, x, iters=5, warmup=2):
    t0 = time.time()
    step(x, jnp.int32(0)).block_until_ready()
    compile_s = time.time() - t0
    ts = []
    salt0 = np.int32(time.time_ns() & 0x7FFF)
    for i in range(warmup + iters):
        t0 = time.time()
        step(x, jnp.int32(salt0 + i)).block_until_ready()
        ts.append(time.time() - t0)
    return compile_s, float(np.median(ts[warmup:]))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [1 << 18, 1 << 22, 1 << 25]
    rng = np.random.default_rng(time.time_ns() & 0xFFFFFFFF)
    dev = jax.devices()[0]
    log(f"device: {dev}")

    for n in sizes:
        flat = rng.integers(0, 1 << 30, size=n, dtype=np.int32)
        x = jax.device_put(flat, dev)

        # correctness first (fresh data, run once)
        got = np.asarray(vmem_sort(x))
        want = np.sort(flat, kind="stable")
        ok = np.array_equal(got, want)
        log(f"n=2^{n.bit_length()-1}: correct={ok}")
        if not ok:
            bad = np.flatnonzero(got != want)
            log(f"  first mismatches at {bad[:5]}: got {got[bad[:5]]} want {want[bad[:5]]}")
            continue

        w = jnp.arange(n, dtype=jnp.int32) & 1023

        @jax.jit
        def vstep(x, salt):
            y = vmem_sort(x ^ salt)
            return jnp.sum((y & 0xFFFF) * w)

        @jax.jit
        def lstep(x, salt):
            y = jnp.sort(x ^ salt)
            return jnp.sum((y & 0xFFFF) * w)

        c1, t1 = timed(vstep, x)
        c2, t2 = timed(lstep, x)
        log(
            f"  vmem_sort: compile {c1:6.1f}s  {t1*1e3:8.2f} ms  {n/t1/1e6:7.0f} M elem/s\n"
            f"  lax.sort : compile {c2:6.1f}s  {t2*1e3:8.2f} ms  {n/t2/1e6:7.0f} M elem/s\n"
            f"  speedup {t2/t1:.2f}x"
        )


if __name__ == "__main__":
    main()
