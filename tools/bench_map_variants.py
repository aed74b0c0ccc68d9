"""On-chip A/B of dense-mapping kernel formulations (salted, in-jit).

Variants (all produce bin counts + batch hitmask unless noted):
  sortrle   — the round-2 kernel: per-tile key sort + where/gather RLE
  slice_il  — no-sort bins, interleaved (pos, n_sg) layout + idx/sg gathers
  slice_pl  — no-sort bins, planar (n_sg, pos) layout
  comp_pl   — planar + composite table value ((idx+1)*8 | sg): one gather
  bins_only — comp_pl without the hitmask
  hit_only  — batch hitmask alone (sort + m searchsorted)
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
M = 1 << 21


def main():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.io.genome import tile_words_for
    from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, forward_codes
    from subphaser_tpu.ops.mapbins import nbins_for_tile
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    n_pos = TILE_BASES
    nbt = nbins_for_tile(TILE_BASES, BIN_SIZE)
    mask_code = (1 << (2 * K)) - 1

    rng = np.random.default_rng(0)
    n_words = tile_words_for(TILE_BASES, K)
    words = rng.integers(0, 2**32, size=(N_TILES, n_words), dtype=np.uint32).astype(np.int32)
    vwords = np.full((N_TILES, n_words), np.uint32(0xFFFF)).astype(np.int32)
    starts = rng.integers(0, 1 << 28, size=N_TILES, dtype=np.int32)
    sig_codes = np.sort(rng.choice(1 << (2 * K), size=M, replace=False).astype(np.int32))
    sig_sg = rng.integers(0, N_SG, size=M, dtype=np.int32)

    # idx table (idx+1) and composite table ((idx+1)*8 | sg)
    t_idx = np.zeros(1 << (2 * K), np.int32)
    t_idx[sig_codes] = np.arange(M, dtype=np.int32) + 1
    t_comp = np.zeros(1 << (2 * K), np.int32)
    t_comp[sig_codes] = ((np.arange(M, dtype=np.int32) + 1) << 3) | sig_sg

    ws = jax.device_put(words)
    vs = jax.device_put(vwords)
    st = jax.device_put(starts)
    d_idx = jax.device_put(t_idx)
    d_comp = jax.device_put(t_comp)
    d_sg = jax.device_put(sig_sg)

    def checksum(x):
        return jnp.sum(
            x.reshape(-1).astype(jnp.uint32)
            * jax.lax.iota(jnp.uint32, x.size)
        )

    def bins_sortrle(hit, sg, s):
        p = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 0)
        w_i = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
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
        return jnp.where((di < n) & (ukeys[di_c] == dense_keys), rcounts[di_c], 0)

    def bins_interleaved(hit, sg, s):
        hr = (hit[..., None] & (sg[..., None] == jnp.arange(N_SG, dtype=sg.dtype))).astype(jnp.int32)
        pos_rows = jnp.swapaxes(hr, 0, 1).reshape(n_pos, N_SG)
        r = jnp.asarray(s, jnp.int32) % BIN_SIZE
        arr = jnp.zeros((nbt * BIN_SIZE, N_SG), jnp.int32)
        arr = jax.lax.dynamic_update_slice(arr, pos_rows, (r, 0))
        return arr.reshape(nbt, BIN_SIZE, N_SG).sum(axis=1, dtype=jnp.int32)

    def bins_planar(hit, sg, s):
        hr = (hit[None] & (sg[None] == jnp.arange(N_SG, dtype=sg.dtype)[:, None, None])).astype(jnp.int32)
        pos_rows = jnp.swapaxes(hr, 1, 2).reshape(N_SG, n_pos)
        r = jnp.asarray(s, jnp.int32) % BIN_SIZE
        arr = jnp.zeros((N_SG, nbt * BIN_SIZE), jnp.int32)
        arr = jax.lax.dynamic_update_slice(arr, pos_rows, (0, r))
        return arr.reshape(N_SG, nbt, BIN_SIZE).sum(axis=2, dtype=jnp.int32)

    def hitmask(all_hidx):
        shidx = jnp.sort(all_hidx.reshape(-1))
        dense_j = jnp.arange(M, dtype=shidx.dtype)
        dj = jnp.searchsorted(shidx, dense_j)
        dj_c = jnp.minimum(dj, shidx.shape[0] - 1)
        return (dj < shidx.shape[0]) & (shidx[dj_c] == dense_j)

    def make(kind):
        @jax.jit
        def step(ws, vs, st, salt, t_i, t_c, sgv):
            def one(args):
                w, v, s = args
                fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
                fc = fcodes.reshape(-1) & mask_code
                if kind in ("sortrle", "slice_il", "slice_pl"):
                    vals = t_i[fc].reshape(fcodes.shape)
                    hit = (vals > 0) & (fcodes != SENTINEL)
                    idx = jnp.maximum(vals - 1, 0)
                    sg = sgv[idx]
                else:
                    vals = t_c[fc].reshape(fcodes.shape)
                    hit = (vals > 0) & (fcodes != SENTINEL)
                    idx = jnp.maximum((vals >> 3) - 1, 0)
                    sg = vals & 7
                if kind == "sortrle":
                    bc = bins_sortrle(hit, sg, s)
                elif kind == "slice_il":
                    bc = bins_interleaved(hit, sg, s)
                elif kind == "hit_only":
                    bc = jnp.zeros((1,), jnp.int32)
                else:
                    bc = bins_planar(hit, sg, s)
                hidx = jnp.where(hit, idx, SENTINEL).reshape(-1)
                return checksum(bc), hidx

            cks, hidxs = jax.lax.map(one, (ws, vs, st))
            out = jnp.sum(cks)
            if kind != "bins_only":
                out = out + checksum(hitmask(hidxs))
            return out

        return step

    base = int.from_bytes(os.urandom(3), "little")
    for kind in ("sortrle", "slice_il", "slice_pl", "comp_pl", "bins_only", "hit_only"):
        step = make(kind)
        t0 = time.time()
        out = int(step(ws, vs, st, jnp.int32(base), d_idx, d_comp, d_sg))
        print(f"{kind}: compile+first {time.time()-t0:.1f}s", flush=True)
        int(step(ws, vs, st, jnp.int32(base + 1), d_idx, d_comp, d_sg))
        t0 = time.time()
        iters = 4
        for i in range(iters):
            out = int(step(ws, vs, st, jnp.int32((out + i) & 0x7FFFFFFF), d_idx, d_comp, d_sg))
        dt = (time.time() - t0) / iters
        mbp = N_TILES * TILE_BASES / 1e6
        print(f"{kind}: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch) checksum={out}", flush=True)


if __name__ == "__main__":
    main()
