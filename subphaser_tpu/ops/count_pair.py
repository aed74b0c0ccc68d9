"""Sort-based counting for pair codes (k in [16, 30]).

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
    n = hi.size
    shi, slo = jax.lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)
    start = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    )
    (pos,) = jnp.where(start, size=n, fill_value=n)
    valid = pos < n
    pos_c = jnp.minimum(pos, n - 1)
    uhi = jnp.where(valid, shi[pos_c], SENTINEL)
    ulo = jnp.where(valid, slo[pos_c], SENTINEL)
    counts = jnp.diff(pos, append=jnp.int32(n))
    counts = jnp.where(uhi == SENTINEL, 0, counts).astype(jnp.int32)
    uhi = jnp.where(counts > 0, uhi, SENTINEL)
    ulo = jnp.where(counts > 0, ulo, SENTINEL)
    return uhi, ulo, counts


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
def _merge_flat_pair(hi, lo, counts):
    shi, slo, scounts = jax.lax.sort((hi, lo, counts), num_keys=2)
    n = shi.size
    start = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    )
    (pos,) = jnp.where(start, size=n, fill_value=n)
    csum = jnp.cumsum(scounts)
    end = jnp.minimum(jnp.diff(pos, append=jnp.int32(n)) + pos, n) - 1
    run_tot = csum[jnp.maximum(end, 0)] - jnp.where(
        pos > 0, csum[jnp.maximum(pos - 1, 0)], 0
    )
    valid = pos < n
    pos_c = jnp.minimum(pos, n - 1)
    uhi = jnp.where(valid, shi[pos_c], SENTINEL)
    ulo = jnp.where(valid, slo[pos_c], SENTINEL)
    ucounts = jnp.where(valid & (uhi != SENTINEL), run_tot, 0)
    uhi = jnp.where(ucounts > 0, uhi, SENTINEL)
    ulo = jnp.where(ucounts > 0, ulo, SENTINEL)
    return uhi, ulo, ucounts.astype(jnp.int32)


def merge_rle_many_pair(parts):
    if len(parts) == 1:
        return parts[0]
    hi = jnp.concatenate([p[0] for p in parts])
    lo = jnp.concatenate([p[1] for p in parts])
    counts = jnp.concatenate([p[2] for p in parts])
    total = int(hi.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        pad = cap - total
        hi = jnp.concatenate([hi, jnp.full(pad, SENTINEL, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.full(pad, SENTINEL, lo.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
    return _merge_flat_pair(hi, lo, counts)


@jax.jit
def count_surviving_pair(counts, lower):
    return jnp.sum(counts >= lower)


@functools.partial(jax.jit, static_argnames=("cap",))
def threshold_compact_pair(hi, lo, counts, lower, cap: int):
    n = hi.shape[0]
    mask = (counts >= lower) & (hi != SENTINEL)
    (pos,) = jnp.where(mask, size=cap, fill_value=n)
    valid = pos < n
    pos_c = jnp.minimum(pos, n - 1)
    out_hi = jnp.where(valid, hi[pos_c], SENTINEL)
    out_lo = jnp.where(valid, lo[pos_c], SENTINEL)
    out_counts = jnp.where(valid, counts[pos_c], 0)
    return out_hi, out_lo, out_counts


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
            hi, lo, counts = merge_rle_many_pair(self.parts)
            self.parts = []
            self.pending = 0
            m = int(count_surviving_pair(counts, lower_count))
            cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
            cap = min(cap, int(hi.shape[0]))
            uh, ul, uc = threshold_compact_pair(hi, lo, counts, lower_count, cap)
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
