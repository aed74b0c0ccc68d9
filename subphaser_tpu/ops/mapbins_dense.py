"""Dense direct-address significant-k-mer mapping (k <= 15).

Measured on the v5e: vectorized searchsorted runs ~8 M lookups/s (it is a
~14-step gather loop), while one direct gather from a dense table reaches
~75 M lookups/s. For k <= 15 the full 4^k code space fits a dense int32
table (4 GB at k=15), built once per run with a single small scatter.

The table value is COMPOSITE: ((idx + 1) << SG_BITS) | sg, so one gather
yields membership, the sig-table index (for the distinct-hit statistic),
and the subgenome id — the separate sig_sg gather it replaces cost ~170 ms
per 34 Mb batch (tools/bench_map_variants.py: comp_pl vs slice_pl).

Bin counting and the distinct-hit list use the shared no-sort helpers in
ops/mapbins (see that module's docstring for the formulation and measured
costs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
from subphaser_tpu.ops.mapbins import bin_counts_auto, distinct_hits

SG_BITS = 4  # supports n_sg <= 16 and sig counts up to 2^26


@functools.partial(jax.jit, static_argnames=("k",))
def build_sig_table(sig_codes, sig_sg, k: int):
    """int32 table over [0, 4^k): ((idx + 1) << SG_BITS) | sg, 0 = miss.

    SENTINEL pad codes (phase/warmup.pad_sig_pow2) scatter out of bounds and
    are dropped, so padding never creates table entries.
    """
    size = 1 << (2 * k)
    table = jnp.zeros(size, dtype=jnp.int32)
    idx = jnp.arange(sig_codes.shape[0], dtype=jnp.int32) + 1
    vals = (idx << SG_BITS) | sig_sg.astype(jnp.int32)
    return table.at[sig_codes].set(vals)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile",
                     "aligned16"),
)
def map_tiles_batch_dense(
    words, vwords, table, sig_sg, starts,
    *, k: int, n_pos_words: int, bin_size: int, n_sg: int, nbins_tile: int,
    aligned16: bool = False,
):
    """Batch of tiles -> ((T, nbins, n_sg) counts, merged distinct-hit list).

    ``sig_sg`` is only consulted for the sig-table SIZE (the sg ids ride in
    the composite table value); it is kept in the signature so the dense and
    searchsorted paths stay call-compatible.
    """
    mask_code = (1 << (2 * k)) - 1
    m = sig_sg.shape[0]

    def one(args):
        w, v, start = args
        fcodes = forward_codes(w, v, k, n_pos_words)  # (16, W)
        vals = table[fcodes.reshape(-1) & mask_code].reshape(fcodes.shape)
        hit = (vals > 0) & (fcodes != SENTINEL)
        idx = jnp.maximum((vals >> SG_BITS) - 1, 0)
        sg = vals & ((1 << SG_BITS) - 1)
        bc = bin_counts_auto(
            hit, sg, start, bin_size=bin_size, n_sg=n_sg,
            nbins_tile=nbins_tile, aligned16=aligned16,
        )
        return bc, jnp.where(hit, idx, SENTINEL).reshape(-1)

    if words.ndim == 1:
        bc, hidx = one((words, vwords, starts))
        return bc[None], distinct_hits(hidx, m)
    bcs, hidxs = jax.lax.map(one, (words, vwords, starts))
    return bcs, distinct_hits(hidxs, m)
