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
    lower op count than a masked bitonic network, so lax.sort stays.
    RLE/compaction use contiguous scans + a second sort; the
    where(size=)+gather formulation costs ~10x the sort itself.)
    """
    n = codes.size
    s = jnp.sort(codes.reshape(-1))
    keep, runlen, _m = _sorted_run_survivors(s, 1)
    return _compact_survivors(s, keep, runlen, n)


@jax.jit
def _merge_sorted_runs(codes, counts, lower):
    """Sort (code, count) pairs and compute gather-free run totals.

    Returns (sorted codes, run totals, keep mask at run ends, survivor
    count). Run totals: inclusive cumsum minus the cumsum value just
    before the run's start, propagated to every position with a prefix max
    — contiguous scans only (see _sorted_run_survivors for why gathers
    are banned here).
    """
    codes, counts = jax.lax.sort((codes, counts), num_keys=1)
    n = codes.size
    start = jnp.concatenate([jnp.ones(1, bool), codes[1:] != codes[:-1]])
    end = jnp.concatenate([codes[:-1] != codes[1:], jnp.ones(1, bool)])
    csum = jnp.cumsum(counts)
    base = jax.lax.cummax(jnp.where(start, csum - counts, jnp.int32(-1)))
    run_tot = csum - base
    keep = end & (run_tot >= lower) & (codes != SENTINEL) & (run_tot > 0)
    return codes, run_tot.astype(jnp.int32), keep, jnp.sum(keep)


def merge_rle_many(parts, lower_count: int = 1):
    """Merge many sorted spectra in ONE sort (vs a pairwise merge tree),
    compacted on device to the (pow2-bucketed) survivor count.

    Pads the concatenation to the next power of two so the jit compiles once
    per size bucket (amortized by the persistent compilation cache).
    ``lower_count`` > 1 additionally applies the dump threshold during the
    same pass (only valid when ``parts`` cover ALL of a chromosome's
    counts).
    """
    if len(parts) == 1 and lower_count <= 1:
        return parts[0]
    codes = jnp.concatenate([p[0] for p in parts]) if len(parts) > 1 else parts[0][0]
    counts = jnp.concatenate([p[1] for p in parts]) if len(parts) > 1 else parts[0][1]
    total = int(codes.size)
    cap = 1 << max(total - 1, 1).bit_length()
    if cap > total:
        codes = jnp.concatenate([codes, jnp.full(cap - total, SENTINEL, codes.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(cap - total, counts.dtype)])
    s, run_tot, keep, m = _merge_sorted_runs(codes, counts, lower_count)
    m = int(m)
    out_cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
    out_cap = min(out_cap, int(s.shape[0]))
    return _compact_survivors(s, keep, run_tot, out_cap)


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


@jax.jit
def _sorted_run_survivors(s, lower):
    """Sorted codes -> (keep mask at run ends, run lengths, survivor count).

    Gather-free run-length encoding: run boundaries are elementwise
    compares and the distance to each run's start comes from a prefix max
    (lax.cummax) — contiguous scans only. The where(size=n)+full-width
    gather formulation costs ~10x the SORT itself on the v5e (measured
    1.1 s vs 82 ms at 33.5M; tools/bench_count_parts.py).
    """
    n = s.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    end = jnp.concatenate([s[:-1] != s[1:], jnp.ones(1, bool)])
    last_start = jax.lax.cummax(jnp.where(start, iota, -1))
    runlen = iota - last_start + 1
    keep = end & (runlen >= lower) & (s != SENTINEL)
    return keep, runlen, jnp.sum(keep)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_survivors(s, keep, runlen, cap: int):
    """One right-sized compaction: survivor codes + counts (cap entries).

    Compaction by SORT, not by jnp.where(size=cap): nonzero(size=) lowers
    through bincount = a full-length scatter-add plus wide gathers, which
    costs 270-550 ms at 33.5M on the v5e (tools/bench_count_parts.py);
    a second key-value sort with non-survivors pushed to SENTINEL followed
    by a static slice is contiguous-only.
    """
    keys = jnp.where(keep, s, SENTINEL)
    vals = jnp.where(keep, runlen, 0)
    sk, sv = jax.lax.sort((keys, vals), num_keys=1)
    out_codes = sk[:cap]
    out_counts = jnp.where(out_codes != SENTINEL, sv[:cap], 0)
    return out_codes, out_counts


@jax.jit
def _sort_only(codes):
    return jnp.sort(codes.reshape(-1))


def _concat_pow2(code_parts):
    """Concat parts + SENTINEL pad to the next pow2 in ONE eager concat.

    One N-ary concatenate keeps this a single cached program per part-size
    structure; a parts-concat followed by a pad-concat would be two remote
    compiles (~50s each through the tunnel), and the warm-up thread
    (phase/warmup) predicts part structures to precompile exactly this."""
    total = sum(int(p.size) for p in code_parts)
    cap = 1 << max(total - 1, 1).bit_length()
    parts = list(code_parts)
    if cap > total:
        parts.append(jnp.full(cap - total, SENTINEL, code_parts[0].dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def count_codes_threshold(code_parts, lower_count: int):
    """Raw code arrays -> host (codes int32, counts) with
    count >= lower_count, via ONE keys-only sort of the concatenation
    (pow2-padded so the compile caches per size bucket), scan-based RLE,
    and a single compaction sized to the survivor count."""
    if not code_parts:  # zero-length chromosome
        return np.empty(0, np.int32), np.empty(0, np.int64)
    codes = _concat_pow2(code_parts)
    s = _sort_only(codes)
    keep, runlen, m = _sorted_run_survivors(s, lower_count)
    m = int(m)
    out_cap = max(1 << max(m - 1, 1).bit_length(), 1 << 10)
    out_cap = min(out_cap, int(s.shape[0]))
    uu, cc = _compact_survivors(s, keep, runlen, out_cap)
    out_c, out_n = compact_host(uu, cc)
    return out_c, out_n.astype(np.int64)


def count_codes_async(code_parts, lower_count: int, static_cap: int):
    """Dispatch the fused count (sort + scan RLE + compaction) WITHOUT
    blocking: returns device handles (codes, counts, m).

    Uses a STATIC compaction cap so no host sync happens at dispatch time —
    the caller overlaps several chromosomes' compute with the (slow) host
    downloads and falls back to the exact two-phase path when m exceeds
    the cap (count_codes_collect).
    """
    if not code_parts:  # zero-length chromosome
        return None
    codes = _concat_pow2(code_parts)
    static_cap = min(static_cap, int(codes.size))
    s = _sort_only(codes)
    keep, runlen, m = _sorted_run_survivors(s, lower_count)
    u, c = _compact_survivors(s, keep, runlen, static_cap)
    return u, c, m


DOWNLOAD_CHUNK = 1 << 19


@functools.partial(jax.jit, static_argnames=("chunk",))
def _slice_chunk(u, c, start, chunk: int):
    """Fixed-size window at a DYNAMIC start: one cached program covers every
    download length (a static per-length slice would be a fresh ~50s remote
    compile per survivor-count bucket)."""
    return (
        jax.lax.dynamic_slice(u, (start,), (chunk,)),
        jax.lax.dynamic_slice(c, (start,), (chunk,)),
    )


def count_codes_collect(handles, lower_count: int, rebuild_parts=None):
    """Block on one dispatched count: returns host (codes, counts int64).

    Downloads only ceil(m / DOWNLOAD_CHUNK) fixed-size windows of the
    compacted arrays (entries past m are SENTINEL/0). When the survivor
    count overflowed the static cap, recompute exactly via
    ``rebuild_parts()`` -> count_codes_threshold (rare; repeat-dense
    chromosomes with low lower_count).
    """
    if handles is None:  # zero-length chromosome
        return np.empty(0, np.int32), np.empty(0, np.int64)
    u, c, m_dev = handles
    m = int(m_dev)
    cap = int(u.shape[0])
    if m > cap:
        if rebuild_parts is None:
            raise RuntimeError(f"survivors {m} exceed static cap {cap}")
        from subphaser_tpu.utils.log import logger

        logger.info(
            "Survivors (%d) exceed the async cap (%d); exact recompute", m, cap
        )
        return count_codes_threshold(rebuild_parts(), lower_count)
    chunk = min(DOWNLOAD_CHUNK, cap)
    n_chunks = max(1, -(-m // chunk))
    # dispatch every window first (async), then download in order
    parts = [
        _slice_chunk(u, c, jnp.int32(i * chunk), chunk) for i in range(n_chunks)
    ]
    uu = np.concatenate([np.asarray(p[0]) for p in parts])
    cc = np.concatenate([np.asarray(p[1]) for p in parts])
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

    def finish_async(self, lower_count: int = 1):
        """Merge + threshold on device WITHOUT downloading: returns
        (u, c, m) handles compatible with :func:`count_codes_collect`, or
        None when host spills force the synchronous path (:meth:`finish`).

        Lets the caller overlap this chromosome's survivor download with
        the next chromosome's compute — the same pipeline window the fast
        path uses (downloads through the remote tunnel otherwise serialize
        at 1-3 MB/s per chromosome).
        """
        if self.spilled or not self.parts:
            return None
        u, c = merge_rle_many(self.parts, lower_count)
        self.parts = []
        self.pending = 0
        return u, c, count_surviving(c, 1)

    def finish(self, lower_count: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Merge everything; apply the per-chromosome dump threshold.

        When nothing spilled to host (the normal case), the threshold and
        compaction run on device so only surviving entries cross the link.
        With spills, counts may be split across device and host parts, so
        thresholding happens after the host merge instead.
        """
        if not self.spilled and lower_count > 1 and self.parts:
            u, c = merge_rle_many(self.parts, lower_count)
            self.parts = []
            self.pending = 0
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
