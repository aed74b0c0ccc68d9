"""Decompose ltr/detect.seed_pairs cost on the real chip (salted, in-jit).

Variants:
  sort2   — two-key (code, pos) sort only
  shifts  — + 32 shifted compares and mask sum
  cumsum  — + cumsum over the stacked mask
  full    — + searchsorted compaction + pair gathers (production)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = (1 << 22) + (1 << 15)
K = 15
CAP = 1 << 18
MAX_SHIFT = 32
MINDIST, MAXDIST = 1000, 15000


def main():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE // 16
    n_words = n_pos_words + 1
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**32, size=n_words, dtype=np.uint32).astype(np.int32)
    vwords = np.full(n_words, np.uint32(0xFFFF)).astype(np.int32)

    def make(kind):
        @jax.jit
        def step(w, v, salt):
            codes = forward_codes(w ^ salt, v, K, n_pos_words)
            p = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 0)
            wi = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
            pos = wi * 16 + p
            sc, sp = jax.lax.sort((codes.reshape(-1), pos.reshape(-1)), num_keys=2)
            if kind == "sort2":
                return jnp.sum(sc.astype(jnp.uint32)) + jnp.sum(sp.astype(jnp.uint32))
            masks, ii, jj = [], [], []
            for s in range(1, MAX_SHIFT + 1):
                same = (sc[:-s] == sc[s:]) & (sc[:-s] != SENTINEL)
                d = sp[s:] - sp[:-s]
                ad = jnp.abs(d)
                ok = same & (ad >= MINDIST) & (ad <= MAXDIST)
                pad = jnp.zeros(s, dtype=bool)
                masks.append(jnp.concatenate([ok, pad]))
                i_ = jnp.minimum(sp[:-s], sp[s:])
                j_ = jnp.maximum(sp[:-s], sp[s:])
                ii.append(jnp.concatenate([i_, jnp.full(s, -1, jnp.int32)]))
                jj.append(jnp.concatenate([j_, jnp.full(s, -1, jnp.int32)]))
            mask = jnp.stack(masks).reshape(-1)
            iarr = jnp.stack(ii).reshape(-1)
            jarr = jnp.stack(jj).reshape(-1)
            if kind == "shifts":
                return (jnp.sum(mask) + jnp.sum(iarr.astype(jnp.uint32))
                        + jnp.sum(jarr.astype(jnp.uint32)))
            csum = jnp.cumsum(mask.astype(jnp.int32))
            if kind == "cumsum":
                return csum[-1] + jnp.sum(iarr.astype(jnp.uint32))
            targets = jnp.arange(1, CAP + 1, dtype=jnp.int32)
            sel = jnp.searchsorted(csum, targets)
            valid = targets <= csum[-1]
            sel_c = jnp.minimum(sel, mask.shape[0] - 1)
            out_i = jnp.where(valid, iarr[sel_c], -1)
            out_j = jnp.where(valid, jarr[sel_c], -1)
            return jnp.sum(out_i.astype(jnp.uint32)) + jnp.sum(out_j.astype(jnp.uint32))

        return step

    base = int.from_bytes(os.urandom(3), "little")
    ws = jax.device_put(words)
    vs = jax.device_put(vwords)
    for kind in ("sort2", "shifts", "cumsum", "full"):
        step = make(kind)
        t0 = time.time()
        out = int(step(ws, vs, jnp.int32(base)))
        print(f"{kind}: compile+first {time.time()-t0:.1f}s", flush=True)
        int(step(ws, vs, jnp.int32(base + 1)))
        t0 = time.time()
        iters = 4
        for i in range(iters):
            out = int(step(ws, vs, jnp.int32((out + i) & 0x7FFFFFFF)))
        dt = (time.time() - t0) / iters
        print(f"{kind}: {dt*1e3:.0f} ms/tile checksum={out}", flush=True)


if __name__ == "__main__":
    main()
