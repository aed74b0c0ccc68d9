"""Radix-partition counting experiment (VERDICT r3 next-#7).

Hypothesis: bucketing codes by high bits and sorting buckets independently
beats one global sort, because batched row sorts measured 417-427 M elem/s
vs 286-300 M elem/s for a 2^25 global sort (tools/bench_count_precompact).

The partition itself is the catch: TPUs have no fast scatter, so the
bucketing must ride a sort anyway. Variants measured:

  global   — ONE keys-only lax.sort of n codes (production path).
  radix    — stable sort by the TOP B bits only (narrower comparator),
             then per-bucket full sorts of the contiguous buckets gathered
             into a (2^B, cap) matrix (vmapped row sorts).
  rowfirst — reshape the stream into (R, C) rows, row-sort (fast), then
             one global merge sort of the result (tests whether a
             presorted-rows input speeds lax.sort; XLA's sort is not a
             merge sort, so this is expected negative but cheap to check).

All variants must produce the identical position-weighted checksum of the
sorted stream.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 25
B_BITS = 4


def _time(fn, args, label, iters=4):
    import jax.numpy as jnp

    base = int.from_bytes(os.urandom(3), "little")
    t0 = time.time()
    out = int(fn(*args, jnp.int32(base)))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    int(fn(*args, jnp.int32(base + 1)))
    t0 = time.time()
    for i in range(iters):
        out = int(fn(*args, jnp.int32((out + i) & 0x7FFFFFFF)))
    return (time.time() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1 << 30, size=N, dtype=np.int64).astype(np.int32)
    d = jax.device_put(codes)

    def chk(sorted_codes):
        w = jax.lax.iota(jnp.uint32, sorted_codes.size)
        return jnp.sum(sorted_codes.astype(jnp.uint32) * w)

    @jax.jit
    def s_global(c, salt):
        x = c ^ (salt & 0xFFFF)
        return chk(jnp.sort(x))

    NB = 1 << B_BITS
    CAP = int(N / NB * 1.25) // 8 * 8

    @jax.jit
    def s_radix(c, salt):
        x = c ^ (salt & 0xFFFF)
        hi = (x >> (30 - B_BITS)).astype(jnp.int32)
        # stable partition by bucket id (values as payload)
        _, part = jax.lax.sort((hi, x), num_keys=1, is_stable=True)
        # bucket offsets via searchsorted on the sorted bucket ids
        his = jnp.sort(hi)
        offs = jnp.searchsorted(his, jnp.arange(NB + 1, dtype=jnp.int32))
        # gather buckets into fixed rows (pad with INT32_MAX)
        idx = offs[:-1, None] + jnp.arange(CAP)[None, :]
        valid = idx < offs[1:, None]
        rows = jnp.where(valid, part[jnp.minimum(idx, N - 1)], jnp.int32(2**31 - 1))
        rs = jnp.sort(rows, axis=1)
        # checksum must match the global sort: walk buckets in order,
        # position-weight only the valid prefix of each row
        lens = (offs[1:] - offs[:-1])
        starts = offs[:-1]
        pos_in_row = jnp.arange(CAP)[None, :]
        gpos = starts[:, None] + pos_in_row
        ok = pos_in_row < lens[:, None]
        return jnp.sum(
            jnp.where(ok, rs, 0).astype(jnp.uint32)
            * jnp.where(ok, gpos, 0).astype(jnp.uint32)
        )

    R = 1 << 10

    @jax.jit
    def s_rowfirst(c, salt):
        x = (c ^ (salt & 0xFFFF)).reshape(R, N // R)
        xr = jnp.sort(x, axis=1)
        return chk(jnp.sort(xr.reshape(-1)))

    for label, fn in (("global", s_global), ("radix", s_radix),
                      ("rowfirst", s_rowfirst)):
        dt, out = _time(fn, (d,), label)
        print(f"{label}: {N/dt/1e6:.0f} M elem/s ({dt*1e3:.0f} ms) chk={out}",
              flush=True)


if __name__ == "__main__":
    main()
