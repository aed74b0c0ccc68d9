"""Sort-based exact k-mer counting (device) + spectrum accumulation.

TPUs have no fast random scatter, so the hash tables jellyfish builds on CPU
(reference Jellyfish.py:697-703) are replaced by the TPU-idiomatic primitive:
sort + run-length-encode. Per tile the canonical codes are sorted with XLA's
sort and compacted into a sparse (code, count) spectrum with static shapes
(SENTINEL-padded). Spectra merge by key-value sort + segmented sum — the
device-side equivalent of the reference's host dict merge
(reference Jellyfish.py:439-460).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.kmer import SENTINEL


@jax.jit
def sort_rle(codes: jnp.ndarray):
    """Sort flat int32 codes and run-length encode.

    Returns (ucodes, counts) of the same static length N: unique codes in
    ascending order padded with SENTINEL. A trailing run of SENTINEL inputs
    (invalid positions) shows up as one SENTINEL "code" — dropped downstream.

    (A Pallas VMEM bitonic sort was built and verified — ops/sort_vmem —
    but measured SLOWER than lax.sort at production sizes on the v5e:
    211 vs 298 M elem/s at 2^25. XLA's sort is already VPU-bound at a
    lower op count than a masked bitonic network, so lax.sort stays.)
    """
    n = codes.size
    s = jnp.sort(codes.reshape(-1))
    start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    (pos,) = jnp.where(start, size=n, fill_value=n)
    ucodes = jnp.where(pos < n, s[jnp.minimum(pos, n - 1)], SENTINEL)
    counts = jnp.diff(pos, append=jnp.int32(n))
    counts = jnp.where(ucodes == SENTINEL, 0, counts).astype(jnp.int32)
    ucodes = jnp.where(counts > 0, ucodes, SENTINEL)
    return ucodes, counts


@jax.jit
def merge_rle(codes_a, counts_a, codes_b, counts_b):
    """Merge two SENTINEL-padded sorted spectra, summing duplicate codes."""
    codes = jnp.concatenate([codes_a, codes_b])
    counts = jnp.concatenate([counts_a, counts_b])
    codes, counts = jax.lax.sort((codes, counts), num_keys=1)
    n = codes.size
    start = jnp.concatenate([jnp.ones(1, bool), codes[1:] != codes[:-1]])
    (pos,) = jnp.where(start, size=n, fill_value=n)
    # int32 cumsum is safe: device merges stay per-chromosome (< 2^31 bases);
    # whole-genome totals are summed on host in int64 (merge_host)
    csum = jnp.cumsum(counts)
    end = jnp.minimum(jnp.diff(pos, append=jnp.int32(n)) + pos, n) - 1
    run_tot = csum[jnp.maximum(end, 0)] - jnp.where(pos > 0, csum[jnp.maximum(pos - 1, 0)], 0)
    ucodes = jnp.where(pos < n, codes[jnp.minimum(pos, n - 1)], SENTINEL)
    ucounts = jnp.where((pos < n) & (ucodes != SENTINEL), run_tot, 0)
    ucodes = jnp.where(ucounts > 0, ucodes, SENTINEL)
    return ucodes, ucounts.astype(jnp.int32)


@jax.jit
def _merge_flat(codes, counts):
    """Sort (code, count) pairs and sum runs; one compile per input size."""
    codes, counts = jax.lax.sort((codes, counts), num_keys=1)
    n = codes.size
    start = jnp.concatenate([jnp.ones(1, bool), codes[1:] != codes[:-1]])
    (pos,) = jnp.where(start, size=n, fill_value=n)
    csum = jnp.cumsum(counts)
    end = jnp.minimum(jnp.diff(pos, append=jnp.int32(n)) + pos, n) - 1
    run_tot = csum[jnp.maximum(end, 0)] - jnp.where(pos > 0, csum[jnp.maximum(pos - 1, 0)], 0)
    ucodes = jnp.where(pos < n, codes[jnp.minimum(pos, n - 1)], SENTINEL)
    ucounts = jnp.where((pos < n) & (ucodes != SENTINEL), run_tot, 0)
    ucodes = jnp.where(ucounts > 0, ucodes, SENTINEL)
    return ucodes, ucounts.astype(jnp.int32)


def merge_rle_many(parts):
    """Merge many sorted spectra in ONE sort (vs a pairwise merge tree).

    Pads the concatenation to the next power of two so the jit compiles once
    per size bucket (amortized by the persistent compilation cache).
    """
    if len(parts) == 1:
        return parts[0]
    codes = jnp.concatenate([p[0] for p in parts])
    counts = jnp.concatenate([p[1] for p in parts])
    total = int(codes.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        codes = jnp.concatenate([codes, jnp.full(cap - total, SENTINEL, codes.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(cap - total, counts.dtype)])
    return _merge_flat(codes, counts)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def count_tile(words, vwords, k: int, n_pos_words: int):
    """Packed tile -> sorted sparse (codes, counts) spectrum."""
    from subphaser_tpu.ops.kmer import kmer_codes

    codes = kmer_codes(words, vwords, k, n_pos_words)
    return sort_rle(codes)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def count_tile_batch(words, vwords, k: int, n_pos_words: int):
    """(T, n_words) packed tiles -> one merged sorted spectrum.

    One device call per batch instead of per tile + per merge: through the
    remote tunnel, dispatch round trips dominate, so code extraction runs
    per tile (lax.map bounds memory) and a single sort covers the batch.
    """
    from subphaser_tpu.ops.kmer import kmer_codes

    def one(wv):
        w, v = wv
        return kmer_codes(w, v, k, n_pos_words).reshape(-1)

    codes = jax.lax.map(one, (words, vwords))  # (T, 16*n_pos_words)
    return sort_rle(codes.reshape(-1))


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def extract_codes_batch(words, vwords, k: int, n_pos_words: int):
    """(T, n_words) packed tiles -> flat canonical codes (no sort)."""
    from subphaser_tpu.ops.kmer import kmer_codes

    def one(wv):
        w, v = wv
        return kmer_codes(w, v, k, n_pos_words).reshape(-1)

    if words.ndim == 1:
        return kmer_codes(words, vwords, k, n_pos_words).reshape(-1)
    return jax.lax.map(one, (words, vwords)).reshape(-1)


def count_codes_threshold(code_parts, lower_count: int):
    """Raw code arrays -> host (codes int64-able int32, counts) with
    count >= lower_count, via ONE keys-only sort of the concatenation
    (pow2-padded so the compile caches per size bucket)."""
    if not code_parts:  # zero-length chromosome
        return np.empty(0, np.int32), np.empty(0, np.int64)
    codes = code_parts[0] if len(code_parts) == 1 else jnp.concatenate(code_parts)
    total = int(codes.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        codes = jnp.concatenate([codes, jnp.full(cap - total, SENTINEL, codes.dtype)])
    u, c = sort_rle(codes)
    m = int(count_surviving(c, lower_count))
    out_cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
    out_cap = min(out_cap, int(u.shape[0]))
    uu, cc = threshold_compact(u, c, lower_count, out_cap)
    out_c, out_n = compact_host(uu, cc)
    return out_c, out_n.astype(np.int64)


def compact_host(codes: np.ndarray, counts: np.ndarray):
    """Drop SENTINEL padding on host."""
    m = np.asarray(codes) != SENTINEL
    return np.asarray(codes)[m], np.asarray(counts)[m]


@jax.jit
def count_surviving(counts, lower):
    """Number of entries with count >= lower (scalar, cheap transfer)."""
    return jnp.sum(counts >= lower)


@functools.partial(jax.jit, static_argnames=("cap",))
def threshold_compact(codes, counts, lower, cap: int):
    """Keep entries with count >= lower, compacted to a static-size prefix.

    Transfers through the host link shrink from the padded position count to
    ~the repeat-k-mer count (the axon tunnel makes full-tile transfers the
    end-to-end bottleneck otherwise).
    """
    n = codes.shape[0]
    mask = (counts >= lower) & (codes != SENTINEL)
    (pos,) = jnp.where(mask, size=cap, fill_value=n)
    valid = pos < n
    pos_c = jnp.minimum(pos, n - 1)
    out_codes = jnp.where(valid, codes[pos_c], SENTINEL)
    out_counts = jnp.where(valid, counts[pos_c], 0)
    return out_codes, out_counts


def merge_host(parts: list[tuple[np.ndarray, np.ndarray]]):
    """Merge many sorted (codes, counts) arrays on host (numpy, vectorized)."""
    if not parts:
        return np.empty(0, np.int32), np.empty(0, np.int64)
    codes = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1].astype(np.int64) for p in parts])
    order = np.argsort(codes, kind="stable")
    codes = codes[order]
    counts = counts[order]
    if codes.size == 0:
        return codes, counts
    start = np.empty(codes.size, dtype=bool)
    start[0] = True
    np.not_equal(codes[1:], codes[:-1], out=start[1:])
    idx = np.flatnonzero(start)
    totals = np.add.reduceat(counts, idx)
    return codes[idx], totals


class SpectrumAccumulator:
    """Accumulates per-tile spectra into one chromosome spectrum.

    Parts stay on device unmerged until ``finish``, which merges everything
    in ONE sort (merge_rle_many) — a pairwise merge tree re-sorts every
    element O(log n) times for no benefit. If the pending parts exceed
    ``device_budget`` entries they are pre-merged (and spilled to host only
    beyond the budget — spill transfers are expensive through the remote
    tunnel). This replaces the reference's one-dict-in-parent merge that
    dominates peak RAM (reference Jellyfish.py:446-458).
    """

    def __init__(self, device_budget: int = 1 << 28):
        self.device_budget = device_budget
        self.parts: list[tuple[jnp.ndarray, jnp.ndarray]] = []
        self.pending = 0
        self.spilled: list[tuple[np.ndarray, np.ndarray]] = []

    def add(self, codes: jnp.ndarray, counts: jnp.ndarray) -> None:
        self.parts.append((codes, counts))
        self.pending += int(codes.size)
        if self.pending > self.device_budget:
            merged = merge_rle_many(self.parts)
            self.parts = [merged]
            self.pending = int(merged[0].size)
            if self.pending > self.device_budget:
                self.spilled.append(compact_host(*merged))
                self.parts = []
                self.pending = 0

    def finish(self, lower_count: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Merge everything; apply the per-chromosome dump threshold.

        When nothing spilled to host (the normal case), the threshold and
        compaction run on device so only surviving entries cross the link.
        With spills, counts may be split across device and host parts, so
        thresholding happens after the host merge instead.
        """
        if not self.spilled and lower_count > 1 and self.parts:
            codes, counts = merge_rle_many(self.parts)
            self.parts = []
            self.pending = 0
            m = int(count_surviving(counts, lower_count))
            cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
            cap = min(cap, int(codes.shape[0]))
            u, c = threshold_compact(codes, counts, lower_count, cap)
            out_c, out_n = compact_host(u, c)
            return out_c, out_n.astype(np.int64)
        parts = list(self.spilled)
        if self.parts:
            parts.append(compact_host(*merge_rle_many(self.parts)))
        self.parts = []
        self.pending = 0
        self.spilled = []
        codes, counts = merge_host(parts)
        if lower_count > 1:
            keep = counts >= lower_count
            codes, counts = codes[keep], counts[keep]
        return codes, counts
