"""Decompose count-path time on the chip: codes vs sort vs RLE vs compact.

Times cumulative pipelines at the bench.py size (4 tiles x 8.4 Mbp =
33.5M positions) to locate the real bottleneck. Honest timing: salt inside
the jit, position-weighted checksum, median of 5, fresh seeds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 15
TILE_BASES = 1 << 23
N_TILES = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from subphaser_tpu.io.genome import tile_words_for
    from subphaser_tpu.ops.count import sort_rle
    from subphaser_tpu.ops.kmer import SENTINEL

    n_pos_words = TILE_BASES // 16
    n_words = tile_words_for(TILE_BASES, K)
    rng = np.random.default_rng(time.time_ns() & 0xFFFFFFFF)
    words = rng.integers(0, 2**32, size=(N_TILES, n_words), dtype=np.uint32).astype(np.int32)
    vwords = np.full((N_TILES, n_words), np.int32(0xFFFF))
    dev = jax.devices()[0]
    ws = jax.device_put(words, dev)
    vs = jax.device_put(vwords, dev)
    n_total = N_TILES * 16 * n_pos_words
    w = jnp.arange(n_total, dtype=jnp.int32) & 1023

    def codes_of(ws, vs, salt):
        from subphaser_tpu.ops.kmer import kmer_codes

        def one(wv):
            return kmer_codes(wv[0] ^ salt, wv[1], K, n_pos_words).reshape(-1)

        return jax.lax.map(one, (ws, vs)).reshape(-1)

    stages = {}

    @jax.jit
    def s_codes(ws, vs, salt):
        c = codes_of(ws, vs, salt)
        return jnp.sum((c & 0xFFFF) * w)

    stages["codes"] = s_codes

    @jax.jit
    def s_sort(ws, vs, salt):
        c = codes_of(ws, vs, salt)
        s = jnp.sort(c)
        return jnp.sum((s & 0xFFFF) * w)

    stages["codes+sort"] = s_sort

    @jax.jit
    def s_rle(ws, vs, salt):
        c = codes_of(ws, vs, salt)
        u, cnt = sort_rle(c)
        return jnp.sum((u & 0xFFFF) * w) + jnp.sum(cnt * w)

    stages["codes+sort_rle"] = s_rle

    from subphaser_tpu.ops.count import _sorted_run_survivors, _compact_survivors

    @jax.jit
    def s_scan(ws, vs, salt):
        c = codes_of(ws, vs, salt)
        s = jnp.sort(c)
        keep, runlen, m = _sorted_run_survivors(s, 2)
        return jnp.sum(jnp.where(keep, runlen, 0) * w) + m

    stages["codes+sort+scanRLE"] = s_scan

    def compact_stage(cap):
        @jax.jit
        def s_cmp(ws, vs, salt):
            c = codes_of(ws, vs, salt)
            s = jnp.sort(c)
            keep, runlen, m = _sorted_run_survivors(s, 2)
            u, cc = _compact_survivors(s, keep, runlen, cap)
            wc = w[:cap]
            return jnp.sum((u & 0xFFFF) * wc) + jnp.sum(cc * wc)

        return s_cmp

    stages["+compact@2^19"] = compact_stage(1 << 19)
    stages["+compact@2^22"] = compact_stage(1 << 22)

    @jax.jit
    def s_cummax_only(ws, vs, salt):
        c = codes_of(ws, vs, salt)
        s = jnp.sort(c)
        iota = jnp.arange(s.size, dtype=jnp.int32)
        start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        last = jax.lax.cummax(jnp.where(start, iota, -1))
        return jnp.sum(last * w)

    stages["codes+sort+cummax"] = s_cummax_only

    mbp = N_TILES * TILE_BASES / 1e6
    for name, fn in stages.items():
        t0 = time.time()
        fn(ws, vs, jnp.int32(0)).block_until_ready()
        comp = time.time() - t0
        ts = []
        base = np.int32(time.time_ns() & 0x7FFF)
        for i in range(7):
            t0 = time.time()
            fn(ws, vs, jnp.int32(base + i)).block_until_ready()
            ts.append(time.time() - t0)
        t = float(np.median(ts[2:]))
        log(f"{name:22s} compile {comp:6.1f}s  {t*1e3:8.1f} ms  {mbp/t:6.1f} Mbp/s")


if __name__ == "__main__":
    main()
