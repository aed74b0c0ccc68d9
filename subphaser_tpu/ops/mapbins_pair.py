"""Significant-k-mer bin mapping for pair codes (k in [16, 31]).

Membership testing against the sorted significant-code table uses a
two-level search: binary search on the hi words, then a statically-unrolled
probe over the (tiny) run of equal-hi entries comparing lo. The host
computes the real maximum run length from the table, so the probe depth is
exact, not heuristic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL
from subphaser_tpu.ops.kmer_pair import forward_codes_pair, split64


def max_hi_run(sig_codes64: np.ndarray) -> int:
    """Longest run of equal hi words in the sorted sig table."""
    hi = (np.asarray(sig_codes64, dtype=np.int64) >> 31).astype(np.int32)
    if hi.size == 0:
        return 1
    change = np.flatnonzero(np.diff(hi))
    bounds = np.concatenate([[-1], change, [hi.size - 1]])
    return int(np.max(np.diff(bounds)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile", "probe"),
)
def map_tile_bins_pair(
    words, vwords, sig_hi, sig_lo, sig_sg, start,
    *, k: int, n_pos_words: int, bin_size: int, n_sg: int, nbins_tile: int,
    probe: int,
):
    fhi, flo = forward_codes_pair(words, vwords, k, n_pos_words)  # (16, W)
    m = sig_hi.shape[0]
    base = jnp.searchsorted(sig_hi, fhi)  # leftmost equal-hi position
    hit = jnp.zeros(fhi.shape, dtype=bool)
    sg = jnp.zeros(fhi.shape, dtype=jnp.int32)
    # sig-table position of each hit, for the distinct-hit statistic (one
    # probe pass fills hit/sg/midx together)
    midx = jnp.full(fhi.shape, SENTINEL, dtype=jnp.int32)
    for j in range(probe):
        idx = jnp.minimum(base + j, m - 1)
        ok = (
            (base + j < m)
            & (sig_hi[idx] == fhi)
            & (sig_lo[idx] == flo)
            # pad = (SENTINEL, SENTINEL) PAIR: at k = 31 forward codes can
            # legitimately carry hi == SENTINEL (T^15[G/T]-prefixed
            # windows); only exact T^31 windows alias the pad (see
            # ops/kmer_pair docstring)
            & ((fhi != SENTINEL) | (flo != SENTINEL))
        )
        sg = jnp.where(ok & ~hit, sig_sg[idx], sg)
        midx = jnp.where(ok & ~hit, idx.astype(jnp.int32), midx)
        hit = hit | ok
    from subphaser_tpu.ops.mapbins import bin_counts_auto, distinct_hits

    bin_counts = bin_counts_auto(
        hit, sg, start, bin_size=bin_size, n_sg=n_sg, nbins_tile=nbins_tile,
        aligned16=bin_size % 16 == 0,
    )
    first_bin = jnp.asarray(start, jnp.int32) // bin_size
    return bin_counts, first_bin, distinct_hits(midx, m)


def map_genome_bins_pair(genome, sig_codes64, sig_sg, k, tile_bases, bin_size, n_sg):
    """Map pair-code significant k-mers over a packed genome -> BinAccumulator."""
    from subphaser_tpu.ops.mapbins import BinAccumulator, nbins_for_tile

    sig_hi, sig_lo = split64(sig_codes64)
    probe = max(max_hi_run(sig_codes64), 1)
    sizes = [c.length for c in genome.chroms]
    acc = BinAccumulator(sizes, bin_size, n_sg)
    nbt = nbins_for_tile(tile_bases, bin_size)
    n_pos_words = tile_bases // 16
    for t in genome.tiles(k, tile_bases=tile_bases):
        bc, fb, hm = map_tile_bins_pair(
            t.words, t.vwords, sig_hi, sig_lo, np.asarray(sig_sg, dtype=np.int32),
            np.int32(t.start),
            k=k, n_pos_words=n_pos_words, bin_size=bin_size, n_sg=n_sg,
            nbins_tile=nbt, probe=probe,
        )
        acc.add(t.chrom_index, bc, int(fb), hm)
    return acc
