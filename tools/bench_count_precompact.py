"""Counting beyond the sort ceiling: block-local RLE pre-compaction test.

The production count path is one global keys-only sort + scan RLE
(135-141 Mbp/s on the v5e, within ~6% of the codes+sort composition
ceiling). The remaining named lever (SURVEY §7, VERDICT r2 #5) is
PRE-COMPACTING repetitive data before the global sort so fewer elements
reach it. This measures that idea without committing to a Pallas kernel:

  A (prod)    — global lax.sort(2^25) -> scan RLE
  B (blocks)  — reshape (B, L), lax.sort(axis=1) [independent row sorts,
                fewer merge stages], per-row scan RLE, per-row compaction
                to a static cap, then global KEY-VALUE sort of the
                surviving (code, count) pairs + segment-sum
  sortonly    — the global keys-only sort alone (ceiling reference)
  rowsort     — the batched row sort alone (is it actually faster/elem?)

Inputs: both uniform-random codes (worst case, 0% repeats) and a
wheat-like 85%-repeat mix (codes drawn from a small family pool).
Salted + position-weighted checksums per axon tunnel rules (bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 25          # elements per step
LOG_L = 19           # row length for block sorts
L = 1 << LOG_L
B = N // L
CAP_FRAC = 2         # per-row survivor cap = L / CAP_FRAC


def make_inputs(repeat_frac: float):
    rng = np.random.default_rng(1)
    n_rep = int(N * repeat_frac)
    pool = rng.integers(0, 1 << 30, size=1 << 16, dtype=np.int64)  # families
    rep = pool[rng.integers(0, pool.size, size=n_rep)]
    uniq = rng.integers(0, 1 << 30, size=N - n_rep, dtype=np.int64)
    codes = np.concatenate([rep, uniq])
    rng.shuffle(codes)
    return codes.astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.count import (
        _sorted_run_survivors,
    )
    from subphaser_tpu.ops.kmer import SENTINEL
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    @jax.jit
    def step_sortonly(codes, salt):
        s = jnp.sort(codes ^ (salt & 0xFFFF))
        w = jax.lax.iota(jnp.uint32, N)
        return jnp.sum(s.astype(jnp.uint32) * w)

    @jax.jit
    def step_rowsort(codes, salt):
        s = jnp.sort((codes ^ (salt & 0xFFFF)).reshape(B, L), axis=1)
        w = jax.lax.iota(jnp.uint32, N).reshape(B, L)
        return jnp.sum(s.astype(jnp.uint32) * w)

    @jax.jit
    def step_prod(codes, salt):
        s = jnp.sort(codes ^ (salt & 0xFFFF))
        keep, runlen, _m = _sorted_run_survivors(s, 1)
        w = jax.lax.iota(jnp.uint32, N)
        return jnp.sum(jnp.where(keep, s, 0).astype(jnp.uint32) * w) + jnp.sum(
            jnp.where(keep, runlen, 0).astype(jnp.uint32) * w
        )

    CAP = L // CAP_FRAC

    @jax.jit
    def step_blocks(codes, salt):
        x = (codes ^ (salt & 0xFFFF)).reshape(B, L)
        s = jnp.sort(x, axis=1)
        # per-row scan RLE (all elementwise/contiguous along rows)
        start = jnp.concatenate(
            [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
        )
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        last_start = jax.lax.cummax(jnp.where(start, iota, -1), axis=1)
        end = jnp.concatenate(
            [s[:, :-1] != s[:, 1:], jnp.ones((B, 1), bool)], axis=1
        )
        runlen = iota - last_start + 1
        keep = end & (s != SENTINEL)
        # per-row compaction to CAP via a row sort of masked keys, counts
        # riding as the value operand
        keys = jnp.where(keep, s, SENTINEL)
        vals = jnp.where(keep, runlen, 0)
        sk, sv = jax.lax.sort((keys, vals), dimension=1, num_keys=1)
        sk = sk[:, :CAP]
        sv = sv[:, :CAP]
        overflow = jnp.sum((sk[:, -1] != SENTINEL).astype(jnp.int32))
        # global merge of surviving pairs: one KV sort + segment sum
        gk = sk.reshape(-1)
        gv = sv.reshape(-1)
        mk, mv = jax.lax.sort((gk, gv), num_keys=1)
        g_end = jnp.concatenate([mk[:-1] != mk[1:], jnp.ones(1, bool)])
        csum = jnp.cumsum(mv)
        g_start = jnp.concatenate([jnp.ones(1, bool), mk[1:] != mk[:-1]])
        base = jax.lax.cummax(jnp.where(g_start, csum - mv, jnp.int32(-1)))
        tot = csum - base
        w = jax.lax.iota(jnp.uint32, mk.shape[0])
        return (
            jnp.sum(jnp.where(g_end, mk, 0).astype(jnp.uint32) * w)
            + jnp.sum(jnp.where(g_end, tot, 0).astype(jnp.uint32) * w)
            + overflow.astype(jnp.uint32)
        )

    variants = [
        ("sortonly", step_sortonly),
        ("rowsort", step_rowsort),
        ("prod", step_prod),
        ("blocks", step_blocks),
    ]
    for label, repeat_frac in (("uniform", 0.0), ("wheat85", 0.85)):
        codes = jax.device_put(make_inputs(repeat_frac))
        print(f"--- input: {label} ({repeat_frac:.0%} repeats)", flush=True)
        base = int.from_bytes(os.urandom(3), "little")
        for name, fn in variants:
            t0 = time.time()
            out = int(fn(codes, jnp.int32(base)))
            print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
            int(fn(codes, jnp.int32(base + 1)))
            iters = 4
            t0 = time.time()
            for i in range(iters):
                out = int(fn(codes, jnp.int32((out + i) & 0x7FFFFFFF)))
            dt = (time.time() - t0) / iters
            print(
                f"{name} [{label}]: {N/dt/1e6:.1f} M elem/s "
                f"({dt*1e3:.0f} ms / 2^25) chk={out}",
                flush=True,
            )


if __name__ == "__main__":
    main()
