"""Map subgenome-specific k-mers back onto genome bins (device).

Replaces the reference's hottest Python loop — per-position dict lookup over
every base of the genome (reference Seqs.py:74-153, 209-244) — with:

1. forward-strand codes for every position (ops/kmer.forward_codes; the
   reference's lookup dict holds each significant k-mer AND its reverse
   complement, so forward matching reproduces both-strand hits),
2. membership + SG id via binary search into the sorted significant-code
   table (vectorized searchsorted; the dense-table variant in mapbins_dense
   replaces this for k <= 15 on big genomes),
3. per-(bin, SG) counting WITHOUT a sort: bins are contiguous position
   ranges, so a transpose to position order + one contiguous
   dynamic_update_slice (offset = start % bin_size) + a reshape-sum reduces
   each bin. The sort+RLE formulation this replaces cost ~224 ms per 8.4 Mb
   tile on the v5e (tools/bench_map_parts.py).

The distinct-hit statistic (the mapping-rate log line, reference
Seqs.py:114-117) is carried as a compacted sorted-unique hit-index list per
dispatch and merged on device in HitSet — the dense-boolean formulation
needed an m-element searchsorted per tile (~1.3 s per 34 Mb batch at
m = 2^21, the single largest mapping cost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.count import (
    _compact_survivors,
    _concat_pow2,
    _sort_only,
    _sorted_run_survivors,
)
from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, forward_codes


def bin_counts_contiguous(hit, sg, start, *, bin_size: int, n_sg: int,
                          nbins_tile: int):
    """(16, W) hit/sg grids -> (nbins_tile, n_sg) int32 counts, no sort.

    Flat position offset within the tile is w*16 + p, so swapping the
    (p, w) axes yields position order; bins are then contiguous runs of
    ``bin_size`` rows after shifting by ``start % bin_size``.
    """
    n_pos = hit.shape[0] * hit.shape[1]
    sg_ids = jnp.arange(n_sg, dtype=sg.dtype)[:, None, None]
    rows = (hit[None] & (sg[None] == sg_ids)).astype(jnp.int32)  # (n_sg,16,W)
    pos_rows = jnp.swapaxes(rows, 1, 2).reshape(n_sg, n_pos)
    r = jnp.asarray(start, jnp.int32) % bin_size
    arr = jnp.zeros((n_sg, nbins_tile * bin_size), jnp.int32)
    arr = jax.lax.dynamic_update_slice(arr, pos_rows, (jnp.int32(0), r))
    return arr.reshape(n_sg, nbins_tile, bin_size).sum(axis=2, dtype=jnp.int32).T


def bin_counts_colsum(hit, sg, start, *, bin_size: int, n_sg: int,
                      nbins_tile: int):
    """(16, W) hit/sg grids -> (nbins_tile, n_sg) counts via COLUMN sums.

    Requires ``bin_size % 16 == 0`` and 16-aligned tile starts (both hold
    on the production path: bin_size 10000 = 625*16 and tile starts are
    multiples of the pow2 tile size). Each word-column's 16 positions then
    belong to one bin, so summing over the sublane axis FIRST reduces the
    data 16x before any relayout — the (n_sg, n_pos) transpose +
    full-length dynamic_update_slice of :func:`bin_counts_contiguous`
    (~500 MB of traffic per 34 Mb batch) shrinks to (n_sg, W) column sums.
    """
    cpb = bin_size // 16  # columns per bin
    ids = jnp.arange(n_sg, dtype=sg.dtype)[:, None, None]
    onehot = (hit[None] & (sg[None] == ids)).astype(jnp.int32)  # (n_sg,16,W)
    colsum = onehot.sum(axis=1)  # (n_sg, W)
    q = (jnp.asarray(start, jnp.int32) % bin_size) // 16
    arr = jnp.zeros((n_sg, nbins_tile * cpb), jnp.int32)
    arr = jax.lax.dynamic_update_slice(arr, colsum, (jnp.int32(0), q))
    return arr.reshape(n_sg, nbins_tile, cpb).sum(axis=2, dtype=jnp.int32).T


def bin_counts_auto(hit, sg, start, *, bin_size: int, n_sg: int,
                    nbins_tile: int, aligned16: bool):
    """Dispatch to the column-sum fast path when alignment allows."""
    fn = bin_counts_colsum if (aligned16 and bin_size % 16 == 0) \
        else bin_counts_contiguous
    return fn(hit, sg, start, bin_size=bin_size, n_sg=n_sg,
              nbins_tile=nbins_tile)


def distinct_hits(hidx_flat, cap: int):
    """Flat hit indices (SENTINEL = miss) -> sorted unique, SENTINEL-padded
    to ``cap`` entries (cap is clipped to the input size).

    Two KEYS-ONLY sorts: the first groups duplicates, the second compacts
    the run-end survivors (duplicates masked to SENTINEL). The counts
    payload a key-value compaction would carry is never used here, and a
    keys-only sort runs ~2x a key-value sort on the v5e."""
    n = int(hidx_flat.size)
    s = jnp.sort(hidx_flat.reshape(-1))
    end = jnp.concatenate([s[:-1] != s[1:], jnp.ones(1, bool)])
    u = jnp.sort(jnp.where(end, s, SENTINEL))
    return u[: min(cap, n)]


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile",
                     "aligned16"),
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
    aligned16: bool = False,
):
    """Returns (bin_counts int32 (nbins_tile, n_sg), first_bin int32 scalar,
    hits int32 sorted unique sig-table indices hit, padded SENTINEL).
    """
    fcodes = forward_codes(words, vwords, k, n_pos_words)  # (16, W)
    m = sig_codes.shape[0]
    idx = jnp.searchsorted(sig_codes, fcodes)
    idx_c = jnp.minimum(idx, m - 1)
    hit = (idx < m) & (sig_codes[idx_c] == fcodes) & (fcodes != SENTINEL)
    sg = sig_sg[idx_c]

    bin_counts = bin_counts_auto(
        hit, sg, start, bin_size=bin_size, n_sg=n_sg, nbins_tile=nbins_tile,
        aligned16=aligned16,
    )
    first_bin = jnp.asarray(start, jnp.int32) // bin_size
    hidx = jnp.where(hit, idx_c.astype(jnp.int32), SENTINEL)
    return bin_counts, first_bin, distinct_hits(hidx, m)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "bin_size", "n_sg", "nbins_tile",
                     "aligned16"),
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
    aligned16: bool = False,
):
    """Batch of tiles -> ((T, nbins_tile, n_sg) counts, merged hit list).

    One dispatch per batch (remote-tunnel round trips dominate otherwise);
    per-tile work runs under lax.map to bound memory. The distinct-hit list
    is computed once per BATCH, amortizing its sort over all tiles.
    """
    m = sig_codes.shape[0]

    def one(args):
        w, v, s = args
        fcodes = forward_codes(w, v, k, n_pos_words)
        idx = jnp.searchsorted(sig_codes, fcodes)
        idx_c = jnp.minimum(idx, m - 1)
        hit = (idx < m) & (sig_codes[idx_c] == fcodes) & (fcodes != SENTINEL)
        sg = sig_sg[idx_c]
        bc = bin_counts_auto(
            hit, sg, s, bin_size=bin_size, n_sg=n_sg, nbins_tile=nbins_tile,
            aligned16=aligned16,
        )
        return bc, jnp.where(hit, idx_c.astype(jnp.int32), SENTINEL).reshape(-1)

    bcs, hidxs = jax.lax.map(one, (words, vwords, starts))
    return bcs, distinct_hits(hidxs, m)


def nbins_for_tile(tile_bases: int, bin_size: int) -> int:
    return tile_bases // bin_size + 2


class HitSet:
    """Device-side accumulator of distinct significant-k-mer hits.

    Each ``add`` receives a sorted-unique SENTINEL-padded hit-index array
    (one per dispatched batch); parts stay on device and are consolidated
    in one sort whenever the pending total exceeds ``budget`` entries
    (reusing the pow2-bucketed sort/compact programs the counting path
    already compiled). ``count`` returns the number of distinct indices.
    """

    def __init__(self, budget: int = 1 << 26):
        self.budget = budget
        self.parts: list[jnp.ndarray] = []
        self.pending = 0

    def add(self, hits) -> None:
        self.parts.append(hits)
        self.pending += int(hits.shape[0])
        if self.pending > self.budget and len(self.parts) > 1:
            self._consolidate()

    def _consolidate(self) -> None:
        s = _sort_only(_concat_pow2(self.parts))
        keep, runlen, m = _sorted_run_survivors(s, 1)
        cap = min(1 << max(int(m) - 1, 1).bit_length(), int(s.shape[0]))
        u, _c = _compact_survivors(s, keep, runlen, max(cap, 1))
        self.parts = [u]
        self.pending = int(u.shape[0])

    def count(self) -> int:
        if not self.parts:
            return 0
        s = _sort_only(_concat_pow2(self.parts))
        _keep, _runlen, m = _sorted_run_survivors(s, 1)
        return int(m)

    def snapshot(self) -> "np.ndarray":
        """Distinct hit indices as a sorted host array (SENTINEL stripped).

        Used by the per-chromosome mapping checkpoint: the snapshot persists
        to disk and re-enters a fresh HitSet on resume (distinctness across
        chromosomes is restored by the final count()'s global sort)."""
        import numpy as np

        if not self.parts:
            return np.zeros(0, dtype=np.int32)
        if len(self.parts) > 1:
            self._consolidate()
        u = np.asarray(self.parts[0])
        return u[u != SENTINEL]


class BinAccumulator:
    """Accumulates per-tile bin counts into per-chromosome dense arrays.

    Distinct-hit bookkeeping stays on device (HitSet) until
    ``mapped_kmer_count`` is read.
    """

    def __init__(self, chrom_sizes: list[int], bin_size: int, n_sg: int):
        self.bin_size = bin_size
        self.n_sg = n_sg
        self.per_chrom = [
            np.zeros((-(-size // bin_size), n_sg), dtype=np.int64) for size in chrom_sizes
        ]
        self._hits = HitSet()
        self.mapped_positions = 0

    def add(self, chrom_index: int, bin_counts, first_bin: int, hits=None) -> None:
        bc = np.asarray(bin_counts)
        arr = self.per_chrom[chrom_index]
        nb = arr.shape[0]
        lo = int(first_bin)
        hi = min(lo + bc.shape[0], nb)
        if hi > lo:
            arr[lo:hi] += bc[: hi - lo]
        self.mapped_positions += int(bc.sum())
        if hits is not None:
            self._hits.add(hits)

    @property
    def mapped_kmer_count(self) -> int:
        return self._hits.count()
