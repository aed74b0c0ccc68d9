"""Bisect the _match_count crash: which op kills the worker at 42M scale.

Runs each candidate op standalone on synthetic data of the same shape
(42M int32 sorted keys / queries) and prints device memory stats.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.1f}s -> {out}", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    try:
        print("memory_stats:", dev.memory_stats(), flush=True)
    except Exception as e:
        print("memory_stats unavailable:", e, flush=True)

    n = 10 * (1 << 22)  # 41.9M, the wheat chromosome anchor count
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 30, size=n, dtype=np.int32))
    qs = rng.integers(0, 1 << 30, size=n, dtype=np.int32)
    dk = jax.device_put(keys)
    dq = jax.device_put(qs)

    step("cumsum 42M", lambda: int(jax.jit(lambda x: jnp.cumsum(x)[-1])(dq)))
    step("searchsorted 42M/42M", lambda: int(
        jax.jit(lambda a, v: jnp.searchsorted(a, v).sum())(dk, dq)))
    step("2x searchsorted (left+right)", lambda: int(
        jax.jit(lambda a, v: (jnp.searchsorted(a, v, side="right")
                              - jnp.searchsorted(a, v)).sum())(dk, dq)))

    from subphaser_tpu.ops.anchors import _match_count

    step("_match_count 42M", lambda: int(
        _match_count(dq, jnp.sort(dq), dk, max_occ=8)[2]))

    try:
        print("memory_stats after:", dev.memory_stats(), flush=True)
    except Exception as e:
        pass


if __name__ == "__main__":
    main()
