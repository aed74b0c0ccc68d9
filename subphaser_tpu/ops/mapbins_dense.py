"""Dense direct-address significant-k-mer mapping (k <= 15).

Measured on the v5e: vectorized searchsorted runs ~8 M lookups/s (it is a
~14-step gather loop), while one direct gather from a dense table reaches
~60-105 M lookups/s depending on TABLE BYTES. For k <= 15 the full 4^k
code space fits a dense table built once per run with one small scatter.

Round-4 A/B on the chip (tools/bench_map_next.py mph): an int8 table
(1 GiB, value = sg + 1) runs the mapping kernel at 84.2 Mbp/s vs 70.0 for
the int32 composite table (4 GiB) — gather throughput follows table bytes,
and a two-small-gather CHD perfect hash (34 MiB) lands between (79.7), so
ONE small gather wins. The int8 value carries only membership + subgenome;
the distinct-hit statistic (reference Seqs.py:114-117 mapping rate) dedups
the hit CODES instead of sig-table indices — the same keys-only sort cost,
and code <-> index is a bijection so the statistic is unchanged.

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


@functools.partial(jax.jit, static_argnames=("k",))
def build_sig_table(sig_codes, sig_sg, k: int):
    """int8 table over [0, 4^k): sg + 1, 0 = miss (1 GiB at k=15).

    SENTINEL pad codes (phase/warmup.pad_sig_pow2) scatter out of bounds
    and are dropped, so padding never creates table entries.
    """
    size = 1 << (2 * k)
    table = jnp.zeros(size, dtype=jnp.int8)
    return table.at[sig_codes].set((sig_sg + 1).astype(jnp.int8))


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

    The distinct-hit list holds the hit CODES (sorted unique, SENTINEL
    padded); ``sig_sg`` is only consulted for the sig-set SIZE (the cap of
    the distinct list), keeping the dense and searchsorted paths
    call-compatible.
    """
    mask_code = (1 << (2 * k)) - 1
    m = sig_sg.shape[0]

    def one(args):
        w, v, start = args
        fcodes = forward_codes(w, v, k, n_pos_words)  # (16, W)
        c = fcodes.reshape(-1) & mask_code
        vals = table[c].reshape(fcodes.shape).astype(jnp.int32)
        hit = (vals > 0) & (fcodes != SENTINEL)
        sg = jnp.maximum(vals - 1, 0)
        bc = bin_counts_auto(
            hit, sg, start, bin_size=bin_size, n_sg=n_sg,
            nbins_tile=nbins_tile, aligned16=aligned16,
        )
        return bc, jnp.where(hit.reshape(-1), c, SENTINEL)

    if words.ndim == 1:
        bc, hidx = one((words, vwords, starts))
        return bc[None], distinct_hits(hidx, m)
    bcs, hidxs = jax.lax.map(one, (words, vwords, starts))
    return bcs, distinct_hits(hidxs, m)
