"""Decompose the dense-mapping kernel cost on the real chip.

Variants of ops/mapbins_dense.map_tiles_batch_dense timed separately:
  full      — the production kernel (bin counts + hitmask)
  nohit     — bin counts only (drops the hitmask sort + searchsorted)
  gather    — table gather + reduction only (no sorts)
  codes     — forward codes only

All variants end in a salted position-weighted checksum forced to host
every iteration (axon tunnel rules; see bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 15
TILE_BASES = 1 << 23
N_TILES = 4
BIN_SIZE = 10_000
N_SG = 2
M = 1 << 21  # significant-kmer table entries (both orientations)


def main():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.io.genome import tile_words_for
    from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, forward_codes
    from subphaser_tpu.ops.mapbins import nbins_for_tile
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    nbt = nbins_for_tile(TILE_BASES, BIN_SIZE)
    mask_code = (1 << (2 * K)) - 1

    rng = np.random.default_rng(0)
    n_words = tile_words_for(TILE_BASES, K)
    words = rng.integers(0, 2**32, size=(N_TILES, n_words), dtype=np.uint32).astype(np.int32)
    vwords = np.full((N_TILES, n_words), np.uint32(0xFFFF), dtype=np.uint32).astype(np.int32)
    starts = np.zeros(N_TILES, np.int32)
    sig_codes = np.sort(
        rng.choice(1 << (2 * K), size=M, replace=False).astype(np.int32)
    )
    sig_sg = rng.integers(0, N_SG, size=M, dtype=np.int32)

    t_np = np.zeros(1 << (2 * K), np.int32)
    t_np[sig_codes] = np.arange(M, dtype=np.int32) + 1
    table = jax.device_put(t_np)
    sgs = jnp.asarray(sig_sg)
    ws = jax.device_put(words)
    vs = jax.device_put(vwords)
    st = jax.device_put(starts)

    def tile_core(w, v, s, salt, table, sgs, *, with_bins, with_hit):
        fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
        vals = table[fcodes.reshape(-1) & mask_code].reshape(fcodes.shape)
        hit = (vals > 0) & (fcodes != SENTINEL)
        idx = jnp.maximum(vals - 1, 0)
        out = jnp.sum(jnp.where(hit, idx, 0).astype(jnp.uint32))
        if with_bins:
            sg = sgs[idx]
            p = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 0)
            w_i = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 1)
            pos = s + w_i * BASES_PER_WORD + p
            local_bin = pos // BIN_SIZE - s // BIN_SIZE
            key = jnp.where(hit, local_bin * N_SG + sg, SENTINEL).reshape(-1)
            skey = jnp.sort(key)
            n = skey.shape[0]
            start_run = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
            (rpos,) = jnp.where(start_run, size=n, fill_value=n)
            ukeys = jnp.where(rpos < n, skey[jnp.minimum(rpos, n - 1)], SENTINEL)
            rcounts = jnp.diff(rpos, append=jnp.int32(n))
            rcounts = jnp.where(ukeys == SENTINEL, 0, rcounts)
            dense_keys = jnp.arange(nbt * N_SG, dtype=jnp.int32)
            di = jnp.searchsorted(ukeys, dense_keys)
            di_c = jnp.minimum(di, n - 1)
            bc = jnp.where((di < n) & (ukeys[di_c] == dense_keys), rcounts[di_c], 0)
            out = out + jnp.sum(
                bc.astype(jnp.uint32) * jax.lax.iota(jnp.uint32, bc.size)
            )
        if with_hit:
            hidx = jnp.where(hit, idx, SENTINEL).reshape(-1)
            shidx = jnp.sort(hidx)
            dense_j = jnp.arange(M, dtype=shidx.dtype)
            dj = jnp.searchsorted(shidx, dense_j)
            dj_c = jnp.minimum(dj, shidx.shape[0] - 1)
            hm = (dj < shidx.shape[0]) & (shidx[dj_c] == dense_j)
            out = out + jnp.sum(
                hm.astype(jnp.uint32) * jax.lax.iota(jnp.uint32, M)
            )
        return out

    def make(with_bins, with_hit, with_gather=True):
        @jax.jit
        def step(ws, vs, st, salt, table, sgs):
            def one(args):
                w, v, s = args
                if not with_gather:
                    fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
                    return jnp.sum(
                        jnp.where(fcodes != SENTINEL, fcodes, 0).astype(jnp.uint32)
                    )
                return tile_core(
                    w, v, s, salt, table, sgs,
                    with_bins=with_bins, with_hit=with_hit,
                )

            return jnp.sum(jax.lax.map(one, (ws, vs, st)))

        return step

    variants = [
        ("codes", make(False, False, with_gather=False)),
        ("gather", make(False, False)),
        ("nohit", make(True, False)),
        ("full", make(True, True)),
    ]
    base = int.from_bytes(os.urandom(3), "little")
    for name, fn in variants:
        step = lambda ws, vs, st, salt: fn(ws, vs, st, salt, table, sgs)  # noqa: E731
        t0 = time.time()
        out = int(step(ws, vs, st, jnp.int32(base)))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        int(step(ws, vs, st, jnp.int32(base + 1)))
        t0 = time.time()
        iters = 4
        for i in range(iters):
            out = int(step(ws, vs, st, jnp.int32((out + i) & 0x7FFFFFFF)))
        dt = (time.time() - t0) / iters
        mbp = N_TILES * TILE_BASES / 1e6
        print(f"{name}: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch) checksum={out}",
              flush=True)


def bench_production():
    """Time the REAL map_tiles_batch_dense at production shapes."""
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.io.genome import tile_words_for
    from subphaser_tpu.ops.mapbins import nbins_for_tile
    from subphaser_tpu.ops.mapbins_dense import build_sig_table, map_tiles_batch_dense
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    nbt = nbins_for_tile(TILE_BASES, BIN_SIZE)
    rng = np.random.default_rng(0)
    n_words = tile_words_for(TILE_BASES, K)
    sig_codes = np.sort(rng.choice(1 << (2 * K), size=M, replace=False).astype(np.int32))
    sig_sg = rng.integers(0, N_SG, size=M, dtype=np.int32)
    table = build_sig_table(jnp.asarray(sig_codes), jnp.asarray(sig_sg), K)
    sgs = jax.device_put(sig_sg)
    base = int.from_bytes(os.urandom(3), "little")
    dt_tot = 0.0
    iters = 5
    for i in range(iters + 2):
        words = rng.integers(0, 2**32, size=(N_TILES, n_words), dtype=np.uint32).astype(np.int32)
        vwords = np.full((N_TILES, n_words), np.uint32(0xFFFF)).astype(np.int32)
        starts = rng.integers(0, 1 << 28, size=N_TILES, dtype=np.int32)
        t0 = time.time()
        bcs, hm = map_tiles_batch_dense(
            jax.device_put(words), jax.device_put(vwords), table, sgs,
            jax.device_put(starts),
            k=K, n_pos_words=n_pos_words, bin_size=BIN_SIZE, n_sg=N_SG,
            nbins_tile=nbt,
        )
        chk = int(jnp.sum(bcs.astype(jnp.uint32) * jax.lax.iota(jnp.uint32, bcs.size).reshape(bcs.shape))) + int(jnp.sum(hm))
        dt = time.time() - t0
        if i == 0:
            print(f"prod: compile+first {dt:.1f}s", flush=True)
        elif i >= 2:
            dt_tot += dt
        print(f"  iter {i}: {dt*1e3:.0f} ms chk={chk}", flush=True)
    dt = dt_tot / iters
    mbp = N_TILES * TILE_BASES / 1e6
    print(f"prod: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch)", flush=True)


if __name__ == "__main__":
    if "--prod" in sys.argv:
        bench_production()
    else:
        main()
