"""Sweep the counting-kernel batch size on the real chip.

Times the same fused program bench.py uses (codes -> one keys-only sort ->
scan RLE -> compact) at several N_TILES to pick the honest production-scale
batch for the headline bench. Salting + host-forced scalars per iteration
(see bench.py comments: the axon runtime caches identical executions and
async dispatch returns before compute).

Usage: python tools/bench_batch_sweep.py [n_tiles ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 15
TILE_BASES = 1 << 23


def run(n_tiles: int, iters: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.io.genome import tile_words_for
    from subphaser_tpu.ops.count import _compact_survivors, _sorted_run_survivors
    from subphaser_tpu.ops.kmer import kmer_codes
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    # survivor cap ~ Poisson estimate of count>=2 codes + slack
    n = n_tiles * TILE_BASES
    space = 4**K / 2
    lam = n / space
    est = space * (1 - np.exp(-lam) * (1 + lam))
    cap = 1 << max(int(est * 1.6).bit_length(), 20)
    cap = min(cap, n)

    @jax.jit
    def step(ws, vs, salt):
        def one(wv):
            return kmer_codes(wv[0] ^ salt, wv[1], K, n_pos_words).reshape(-1)

        codes = jax.lax.map(one, (ws, vs)).reshape(-1)
        s = jnp.sort(codes)
        keep, runlen, _m = _sorted_run_survivors(s, 2)
        u, c = _compact_survivors(s, keep, runlen, cap)
        wc = jax.lax.iota(jnp.uint32, cap)
        return jnp.sum(u.astype(jnp.uint32) * wc) + jnp.sum(c.astype(jnp.uint32) * wc)

    rng = np.random.default_rng(0)
    n_words = tile_words_for(TILE_BASES, K)
    words = rng.integers(0, 2**32, size=(n_tiles, n_words), dtype=np.uint32).astype(np.int32)
    vwords = np.full((n_tiles, n_words), np.uint32(0xFFFF), dtype=np.uint32).astype(np.int32)
    ws = jax.device_put(words)
    vs = jax.device_put(vwords)
    base = int.from_bytes(os.urandom(3), "little")
    t0 = time.time()
    out = int(step(ws, vs, jnp.int32(base)))
    print(f"  n_tiles={n_tiles} cap=2^{cap.bit_length()-1} compile+first {time.time()-t0:.1f}s", flush=True)
    int(step(ws, vs, jnp.int32(base + 1)))
    t0 = time.time()
    for i in range(iters):
        out = int(step(ws, vs, jnp.int32((out + i) & 0x7FFFFFFF)))
    dt = (time.time() - t0) / iters
    mbp = n_tiles * TILE_BASES / 1e6
    rate = mbp / dt
    print(f"  n_tiles={n_tiles}: {rate:.1f} Mbp/s ({dt*1e3:.0f} ms / {mbp:.0f} Mbp), checksum={out}", flush=True)
    return rate


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    for nt in sizes:
        run(nt)


if __name__ == "__main__":
    main()
