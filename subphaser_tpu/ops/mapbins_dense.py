"""Dense direct-address significant-k-mer mapping (k <= 15).

Measured on the v5e: vectorized searchsorted runs ~8 M lookups/s (it is a
~14-step gather loop), while one direct gather from a dense table reaches
~67 M lookups/s. For k <= 15 the full 4^k code space fits a dense int32
table (4 GB at k=15; idx+1 entries, 0 = miss), built once per run with a
single small scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, forward_codes


@functools.partial(jax.jit, static_argnames=("k",))
def build_sig_table(sig_codes, k: int):
    """int32 table over [0, 4^k): sig index + 1 at each significant code."""
    size = 1 << (2 * k)
    table = jnp.zeros(size, dtype=jnp.int32)
    idx = jnp.arange(sig_codes.shape[0], dtype=jnp.int32) + 1
    return table.at[sig_codes].set(idx)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile"),
)
def map_tiles_batch_dense(
    words, vwords, table, sig_sg, starts,
    *, k: int, n_pos_words: int, bin_size: int, n_sg: int, nbins_tile: int,
):
    """Batch of tiles -> ((T, nbins, n_sg) counts, OR-reduced hitmask)."""
    mask_code = (1 << (2 * k)) - 1
    m = sig_sg.shape[0]

    def one(args):
        w, v, start = args
        fcodes = forward_codes(w, v, k, n_pos_words)
        vals = table[fcodes.reshape(-1) & mask_code].reshape(fcodes.shape)
        hit = (vals > 0) & (fcodes != SENTINEL)
        idx = jnp.maximum(vals - 1, 0)
        sg = sig_sg[idx]
        p = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 0)
        w_i = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 1)
        pos = start + w_i * BASES_PER_WORD + p
        first_bin = start // bin_size
        local_bin = pos // bin_size - first_bin

        key = jnp.where(hit, local_bin * n_sg + sg, SENTINEL).reshape(-1)
        skey = jnp.sort(key)
        n = skey.shape[0]
        start_run = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
        (rpos,) = jnp.where(start_run, size=n, fill_value=n)
        ukeys = jnp.where(rpos < n, skey[jnp.minimum(rpos, n - 1)], SENTINEL)
        rcounts = jnp.diff(rpos, append=jnp.int32(n))
        rcounts = jnp.where(ukeys == SENTINEL, 0, rcounts)
        dense_keys = jnp.arange(nbins_tile * n_sg, dtype=jnp.int32)
        di = jnp.searchsorted(ukeys, dense_keys)
        di_c = jnp.minimum(di, n - 1)
        bc = jnp.where(
            (di < n) & (ukeys[di_c] == dense_keys), rcounts[di_c], 0
        ).astype(jnp.int32).reshape(nbins_tile, n_sg)

        hidx = jnp.where(hit, idx, SENTINEL).reshape(-1)
        shidx = jnp.sort(hidx)
        dense_j = jnp.arange(m, dtype=shidx.dtype)
        dj = jnp.searchsorted(shidx, dense_j)
        dj_c = jnp.minimum(dj, shidx.shape[0] - 1)
        hm = (dj < shidx.shape[0]) & (shidx[dj_c] == dense_j)
        return bc, hm

    if words.ndim == 1:
        bc, hm = one((words, vwords, starts))
        return bc[None], hm
    bcs, hms = jax.lax.map(one, (words, vwords, starts))
    return bcs, jnp.any(hms, axis=0)
