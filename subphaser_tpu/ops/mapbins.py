"""Map subgenome-specific k-mers back onto genome bins (device).

Replaces the reference's hottest Python loop — per-position dict lookup over
every base of the genome (reference Seqs.py:74-153, 209-244) — with:

1. forward-strand codes for every position (ops/kmer.forward_codes; the
   reference's lookup dict holds each significant k-mer AND its reverse
   complement, so forward matching reproduces both-strand hits),
2. membership + SG id via binary search into the sorted significant-code
   table (vectorized searchsorted),
3. per-(bin, SG) counting via the same sort+RLE primitive used for counting
   (TPUs do sorted-segment reduction far better than random scatter).

Per 8.4 Mb tile this is one searchsorted pass + one 8.4M-element sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, forward_codes


@functools.partial(
    jax.jit, static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile")
)
def map_tile_bins(
    words,        # int32 (n_words,)
    vwords,       # int32 (n_words,)
    sig_codes,    # int32 (M,) sorted forward codes of significant k-mers (+rc)
    sig_sg,       # int32 (M,) SG index per code
    start,        # int32 scalar: tile base offset within the chromosome
    *,
    k: int,
    n_pos_words: int,
    bin_size: int,
    n_sg: int,
    nbins_tile: int,
):
    """Returns (bin_counts int32 (nbins_tile, n_sg), first_bin int32 scalar,
    hit_idx int32 (N,) sorted unique sig-table indices hit, padded SENTINEL).
    """
    fcodes = forward_codes(words, vwords, k, n_pos_words)  # (16, W)
    m = sig_codes.shape[0]
    idx = jnp.searchsorted(sig_codes, fcodes)
    idx_c = jnp.minimum(idx, m - 1)
    hit = (idx < m) & (sig_codes[idx_c] == fcodes) & (fcodes != SENTINEL)
    sg = sig_sg[idx_c]

    p = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 0)
    w = jax.lax.broadcasted_iota(jnp.int32, fcodes.shape, 1)
    pos = start + w * BASES_PER_WORD + p
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

    # densify (nbins_tile * n_sg) by binary search into the unique keys
    dense_keys = jnp.arange(nbins_tile * n_sg, dtype=jnp.int32)
    di = jnp.searchsorted(ukeys, dense_keys)
    di_c = jnp.minimum(di, n - 1)
    dense = jnp.where(
        (di < n) & (ukeys[di_c] == dense_keys), rcounts[di_c], 0
    ).astype(jnp.int32)
    bin_counts = dense.reshape(nbins_tile, n_sg)

    # distinct significant k-mers hit in this tile, as a dense mask over the
    # sig table (for the mapping-rate log, reference Seqs.py:114-117);
    # accumulated on device so only (M,) bools ever cross the host link
    hidx = jnp.where(hit, idx, SENTINEL).reshape(-1)
    shidx = jnp.sort(hidx)
    dense_j = jnp.arange(m, dtype=shidx.dtype)
    dj = jnp.searchsorted(shidx, dense_j)
    dj_c = jnp.minimum(dj, shidx.shape[0] - 1)
    hitmask = (dj < shidx.shape[0]) & (shidx[dj_c] == dense_j)
    return bin_counts, jnp.int32(first_bin), hitmask


@functools.partial(
    jax.jit, static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile")
)
def map_tiles_batch(
    words,      # (T, n_words)
    vwords,     # (T, n_words)
    sig_codes,
    sig_sg,
    starts,     # (T,) int32 tile offsets
    *,
    k: int,
    n_pos_words: int,
    bin_size: int,
    n_sg: int,
    nbins_tile: int,
):
    """Batch of tiles -> ((T, nbins_tile, n_sg) counts, OR-reduced hitmask).

    One dispatch per batch (remote-tunnel round trips dominate otherwise);
    per-tile work runs under lax.map to bound memory.
    """
    def one(args):
        w, v, s = args
        bc, _fb, hm = map_tile_bins(
            w, v, sig_codes, sig_sg, s,
            k=k, n_pos_words=n_pos_words, bin_size=bin_size,
            n_sg=n_sg, nbins_tile=nbins_tile,
        )
        return bc, hm

    bcs, hms = jax.lax.map(one, (words, vwords, starts))
    return bcs, jnp.any(hms, axis=0)


def nbins_for_tile(tile_bases: int, bin_size: int) -> int:
    return tile_bases // bin_size + 2


class BinAccumulator:
    """Accumulates per-tile bin counts into per-chromosome dense arrays.

    The distinct-hit mask stays on device (OR-accumulated jnp bool array)
    until ``mapped_kmer_count`` is read.
    """

    def __init__(self, chrom_sizes: list[int], bin_size: int, n_sg: int):
        self.bin_size = bin_size
        self.n_sg = n_sg
        self.per_chrom = [
            np.zeros((-(-size // bin_size), n_sg), dtype=np.int64) for size in chrom_sizes
        ]
        self._hitmask = None
        self.mapped_positions = 0

    def add(self, chrom_index: int, bin_counts, first_bin: int, hitmask=None) -> None:
        bc = np.asarray(bin_counts)
        arr = self.per_chrom[chrom_index]
        nb = arr.shape[0]
        lo = int(first_bin)
        hi = min(lo + bc.shape[0], nb)
        if hi > lo:
            arr[lo:hi] += bc[: hi - lo]
        self.mapped_positions += int(bc.sum())
        if hitmask is not None:
            self._hitmask = (
                hitmask if self._hitmask is None else self._hitmask | hitmask
            )

    @property
    def mapped_kmer_count(self) -> int:
        if self._hitmask is None:
            return 0
        import jax.numpy as jnp

        return int(jnp.sum(self._hitmask))
