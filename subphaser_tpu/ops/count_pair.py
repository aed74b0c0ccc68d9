"""Sort-based counting for pair codes (k in [16, 31]; hi-only pad
tests are exact for canonical codes even at k = 31 — see ops/kmer_pair).

Mirror of ops/count.py with (hi, lo) int32 key pairs: lax.sort with
num_keys=2, run boundaries on both words, host combine to int64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.count import compact_host  # reused for counts only
from subphaser_tpu.ops.kmer import SENTINEL
from subphaser_tpu.ops.kmer_pair import combine64, kmer_codes_pair


@jax.jit
def sort_rle_pair(hi, lo):
    """2-key sort + scan RLE + sort-based compaction (full width)."""
    n = hi.size
    shi, slo = jax.lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)
    keep, runlen, _m = _sorted_pair_survivors(shi, slo, 1)
    return _compact_survivors_pair(shi, slo, keep, runlen, n)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def count_tile_batch_pair(words, vwords, k: int, n_pos_words: int):
    """(T, n_words) packed tiles -> one merged pair spectrum."""

    def one(wv):
        w, v = wv
        hi, lo = kmer_codes_pair(w, v, k, n_pos_words)
        return hi.reshape(-1), lo.reshape(-1)

    if words.ndim == 1:
        hi, lo = kmer_codes_pair(words, vwords, k, n_pos_words)
    else:
        hi, lo = jax.lax.map(one, (words, vwords))
    return sort_rle_pair(hi.reshape(-1), lo.reshape(-1))


@jax.jit
def _merge_sorted_runs_pair(hi, lo, counts, lower):
    """2-key sort + gather-free run totals (see count._merge_sorted_runs)."""
    shi, slo, scounts = jax.lax.sort((hi, lo, counts), num_keys=2)
    n = shi.size
    neq = (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])
    start = jnp.concatenate([jnp.ones(1, bool), neq])
    end = jnp.concatenate([neq, jnp.ones(1, bool)])
    csum = jnp.cumsum(scounts)
    base = jax.lax.cummax(jnp.where(start, csum - scounts, jnp.int32(-1)))
    run_tot = csum - base
    keep = end & (run_tot >= lower) & (shi != SENTINEL) & (run_tot > 0)
    return shi, slo, run_tot.astype(jnp.int32), keep, jnp.sum(keep)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_survivors_pair(shi, slo, keep, run_tot, cap: int):
    """Sort-based compaction (see count._compact_survivors for why
    jnp.where(size=) is banned on big arrays)."""
    khi = jnp.where(keep, shi, SENTINEL)
    klo = jnp.where(keep, slo, SENTINEL)
    vals = jnp.where(keep, run_tot, 0)
    shi2, slo2, sv = jax.lax.sort((khi, klo, vals), num_keys=2)
    out_hi = shi2[:cap]
    out_lo = jnp.where(out_hi != SENTINEL, slo2[:cap], SENTINEL)
    out_counts = jnp.where(out_hi != SENTINEL, sv[:cap], 0)
    return out_hi, out_lo, out_counts


def merge_rle_many_pair(parts, lower_count: int = 1):
    """Merge pair spectra in one 2-key sort, compacted to the survivor
    count (see count.merge_rle_many)."""
    if len(parts) == 1 and lower_count <= 1:
        return parts[0]
    hi = jnp.concatenate([p[0] for p in parts]) if len(parts) > 1 else parts[0][0]
    lo = jnp.concatenate([p[1] for p in parts]) if len(parts) > 1 else parts[0][1]
    counts = jnp.concatenate([p[2] for p in parts]) if len(parts) > 1 else parts[0][2]
    total = int(hi.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        pad = cap - total
        hi = jnp.concatenate([hi, jnp.full(pad, SENTINEL, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.full(pad, SENTINEL, lo.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
    shi, slo, run_tot, keep, m = _merge_sorted_runs_pair(hi, lo, counts, lower_count)
    m = int(m)
    out_cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
    out_cap = min(out_cap, int(shi.shape[0]))
    return _compact_survivors_pair(shi, slo, keep, run_tot, out_cap)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def extract_pair_codes_batch(words, vwords, k: int, n_pos_words: int):
    """(T, n_words) packed tiles -> flat (hi, lo) canonical pair codes."""

    def one(wv):
        w, v = wv
        hi, lo = kmer_codes_pair(w, v, k, n_pos_words)
        return hi.reshape(-1), lo.reshape(-1)

    if words.ndim == 1:
        hi, lo = kmer_codes_pair(words, vwords, k, n_pos_words)
    else:
        hi, lo = jax.lax.map(one, (words, vwords))
    return hi.reshape(-1), lo.reshape(-1)


@jax.jit
def _sorted_pair_survivors(shi, slo, lower):
    n = shi.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    neq = (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])
    start = jnp.concatenate([jnp.ones(1, bool), neq])
    end = jnp.concatenate([neq, jnp.ones(1, bool)])
    last_start = jax.lax.cummax(jnp.where(start, iota, -1))
    runlen = iota - last_start + 1
    keep = end & (runlen >= lower) & (shi != SENTINEL)
    return keep, runlen, jnp.sum(keep)


@jax.jit
def _sort_only_pair(hi, lo):
    return jax.lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)


def count_pair_codes_threshold(parts, lower_count: int):
    """Raw (hi, lo) code parts -> host (int64 codes, int64 counts) with
    count >= lower_count. Pair-code version of count_codes_threshold: one
    2-key sort over the chromosome, scan RLE, one right-sized compaction.
    """
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    hi = parts[0][0] if len(parts) == 1 else jnp.concatenate([p[0] for p in parts])
    lo = parts[0][1] if len(parts) == 1 else jnp.concatenate([p[1] for p in parts])
    total = int(hi.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        hi = jnp.concatenate([hi, jnp.full(cap - total, SENTINEL, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.full(cap - total, SENTINEL, lo.dtype)])
    shi, slo = _sort_only_pair(hi, lo)
    keep, runlen, m = _sorted_pair_survivors(shi, slo, lower_count)
    m = int(m)
    out_cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
    out_cap = min(out_cap, int(shi.shape[0]))
    uh, ul, uc = _compact_survivors_pair(shi, slo, keep, runlen, out_cap)
    mask = np.asarray(uh) != SENTINEL
    code = combine64(np.asarray(uh)[mask], np.asarray(ul)[mask])
    return code, np.asarray(uc)[mask].astype(np.int64)


@jax.jit
def count_surviving_pair(counts, lower):
    return jnp.sum(counts >= lower)


class PairSpectrumAccumulator:
    """Pair-code version of SpectrumAccumulator; finish() returns int64 codes."""

    def __init__(self, device_budget: int = 1 << 28):
        self.device_budget = device_budget
        self.parts = []
        self.pending = 0
        self.spilled: list[tuple[np.ndarray, np.ndarray]] = []

    def add(self, hi, lo, counts) -> None:
        self.parts.append((hi, lo, counts))
        self.pending += int(hi.size)
        if self.pending > self.device_budget:
            merged = merge_rle_many_pair(self.parts)
            self.parts = [merged]
            self.pending = int(merged[0].size)
            if self.pending > self.device_budget:
                self.spilled.append(self._to_host(merged))
                self.parts = []
                self.pending = 0

    @staticmethod
    def _to_host(entry):
        hi, lo, counts = entry
        m = np.asarray(hi) != SENTINEL
        code = combine64(np.asarray(hi)[m], np.asarray(lo)[m])
        return code, np.asarray(counts)[m].astype(np.int64)

    def finish(self, lower_count: int = 1) -> tuple[np.ndarray, np.ndarray]:
        from subphaser_tpu.ops.count import merge_host

        if not self.spilled and lower_count > 1 and self.parts:
            uh, ul, uc = merge_rle_many_pair(self.parts, lower_count)
            self.parts = []
            self.pending = 0
            code, n = self._to_host((uh, ul, uc))
            order = np.argsort(code, kind="stable")
            return code[order], n[order]
        parts = list(self.spilled)
        if self.parts:
            parts.append(self._to_host(merge_rle_many_pair(self.parts)))
        self.parts = []
        self.pending = 0
        self.spilled = []
        codes, counts = merge_host(parts)
        if lower_count > 1:
            keep = counts >= lower_count
            codes, counts = codes[keep], counts[keep]
        return codes, counts
