"""Sampled k-mer anchors for whole-chromosome alignment (device).

Replaces minimap2's minimizer seeding (reference Blocks.py:42-43): canonical
codes are mod-sampled (code % mod == 0, a density-1/mod minimizer-free
sampling that picks the same k-mers in both sequences), matched by sorted
binary search, and the colinear chaining runs in the native library
(sp_chain_anchors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.io.genome import PackedChromosome, tile_words_for
from subphaser_tpu.ops.kmer import SENTINEL, kmer_codes, forward_codes


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words", "mod", "cap"))
def sampled_anchors(words, vwords, *, k: int, n_pos_words: int, mod: int, cap: int):
    """(codes, pos, strand) of sampled canonical k-mers, SENTINEL padded.

    strand: 0 where the forward code is the canonical one, 1 where the
    reverse complement is.

    Sampling is a multiplicative-hash threshold (density exactly 1/mod,
    deterministic per code so both sequences pick the same k-mers). The
    naive ``canon % mod == 0`` over-samples ~2x: canonical min-codes are
    strongly non-uniform in their low bits (measured 12.1% at residue 0
    mod 16 vs the uniform 6.25%).
    """
    canon = kmer_codes(words, vwords, k, n_pos_words)   # (16, W)
    fwd = forward_codes(words, vwords, k, n_pos_words)
    strand = (canon != fwd).astype(jnp.int32)
    p = jax.lax.broadcasted_iota(jnp.int32, canon.shape, 0)
    w = jax.lax.broadcasted_iota(jnp.int32, canon.shape, 1)
    pos = w * 16 + p
    h = canon.astype(jnp.uint32) * jnp.uint32(2654435761)
    take = (canon != SENTINEL) & (h < jnp.uint32((1 << 32) // mod))
    flat = take.reshape(-1)
    # compaction by cumsum + searchsorted (jnp.where(size=) lowers through a
    # full-length scatter-add; see ltr/detect.seed_pairs for the measured
    # costs of the two formulations)
    csum = jnp.cumsum(flat.astype(jnp.int32))
    n_total = csum[-1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    sel = jnp.searchsorted(csum, targets)
    valid = targets <= n_total
    sel_c = jnp.minimum(sel, flat.shape[0] - 1)
    out_c = jnp.where(valid, canon.reshape(-1)[sel_c], SENTINEL)
    out_p = jnp.where(valid, pos.reshape(-1)[sel_c], -1)
    out_s = jnp.where(valid, strand.reshape(-1)[sel_c], 0)
    return out_c, out_p, out_s, n_total


@functools.partial(jax.jit, static_argnames=("chunk",))
def _slice3(c, p, s, start, chunk: int):
    """Fixed-size download window at a dynamic start (one cached program
    per (cap, chunk) covers every anchor count)."""
    return (
        jax.lax.dynamic_slice(c, (start,), (chunk,)),
        jax.lax.dynamic_slice(p, (start,), (chunk,)),
        jax.lax.dynamic_slice(s, (start,), (chunk,)),
    )


ANCHOR_DOWNLOAD_CHUNK = 1 << 17


def chrom_anchors(
    chrom: PackedChromosome, k: int = 15, mod: int = 16,
    tile_bases: int = 1 << 23,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sampled anchors for a whole chromosome.

    Tiles go through a dispatch-ahead window (compute overlaps the remote
    tunnel's downloads) and only ceil(n_total / chunk) windows of each
    anchor array cross the link; cap overflows retry with 4x the room
    instead of truncating seeds.
    """
    from collections import deque

    from subphaser_tpu.utils.log import logger

    n_pos_words = tile_bases // 16
    n_words = tile_words_for(tile_bases, k)
    # expected anchors ~= tile/mod (pow2 so the download chunk divides it)
    base_cap = max(tile_bases // mod * 2, 1 << 12)

    def dispatch(start, cap):
        w0 = start // 16
        words = np.zeros(n_words, dtype=np.int32)
        vwords = np.zeros(n_words, dtype=np.int32)
        avail = min(n_words, chrom.packed.shape[0] - w0)
        if avail <= 0:
            return None
        words[:avail] = chrom.packed[w0 : w0 + avail]
        vwords[:avail] = chrom.vmask[w0 : w0 + avail]
        c, p, s, n_total = sampled_anchors(
            words, vwords, k=k, n_pos_words=n_pos_words, mod=mod, cap=cap
        )
        return [start, c, p, s, n_total, cap]

    def collect(entry):
        start, c, p, s, n_total, cap = entry
        n = int(n_total)
        while n > cap and cap < (1 << 24):
            cap *= 4
            start, c, p, s, n_total, cap = dispatch(start, cap)
            n = int(n_total)
        if n > cap:
            logger.warning(
                "anchor cap overflow on %s @%d: %d sampled > cap %d; "
                "alignment seeds truncated",
                chrom.name, start, n, cap,
            )
            n = cap
        chunk = min(ANCHOR_DOWNLOAD_CHUNK, cap)  # both pow2: chunk divides cap
        n_chunks = max(1, -(-n // chunk))
        parts = [
            _slice3(c, p, s, np.int32(i * chunk), chunk)
            for i in range(n_chunks)
        ]
        ch = np.concatenate([np.asarray(x[0]) for x in parts])
        ph = np.concatenate([np.asarray(x[1]) for x in parts])
        sh = np.concatenate([np.asarray(x[2]) for x in parts])
        m = ch != SENTINEL
        return ch[m], ph[m] + start, sh[m]

    codes, poss, strands = [], [], []
    window: deque = deque()
    for start in range(0, chrom.length, tile_bases):
        entry = dispatch(start, base_cap)
        if entry is None:
            continue
        window.append(entry)
        if len(window) > 3:
            c, p, s = collect(window.popleft())
            codes.append(c); poss.append(p); strands.append(s)
    while window:
        c, p, s = collect(window.popleft())
        codes.append(c); poss.append(p); strands.append(s)
    if not codes:
        return (np.zeros(0, np.int32),) * 3
    return (
        np.concatenate(codes),
        np.concatenate(poss).astype(np.int64),
        np.concatenate(strands),
    )


class DevAnchors:
    """A chromosome's sampled anchors, resident on device.

    ``c``/``p``/``s`` are position-ordered, compacted to a rounded cap
    (SENTINEL/-1 pads only at the tail). ``sorted3()`` lazily computes and
    memoizes the code-sorted copy — each chromosome participates in every
    pair of its homoeologous set, so the t-side sort (and the q-side
    occurrence lookup) is paid once per chromosome, not once per pair.

    Iterable as (c, p, s, n) for older call sites."""

    __slots__ = ("c", "p", "s", "n", "_sorted", "_occ")

    def __init__(self, c, p, s, n: int):
        self.c, self.p, self.s, self.n = c, p, s, n
        self._sorted = None
        self._occ = None

    def __iter__(self):
        return iter((self.c, self.p, self.s, self.n))

    def __getitem__(self, i):
        return (self.c, self.p, self.s, self.n)[i]

    def sorted3(self):
        if self._sorted is None:
            self._sorted = _sort3(self.c, self.p, self.s)
        return self._sorted

    def occ(self):
        """Per-anchor occurrence count of its code within this chromosome
        (cached: q_occ depends only on the q side, so it is paid once per
        chromosome, not once per pair)."""
        if self._occ is None:
            lo, hi = _ss_left_right(self.sorted3()[0], self.c)
            self._occ = hi - lo
        return self._occ


@jax.jit
def _sort3(c, p, s):
    return jax.lax.sort((c, p, s), num_keys=1)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact3(c, p, s, *, cap: int):
    """Drop interleaved per-tile SENTINEL pads (cumsum + searchsorted,
    never jnp.where(size=)); output padded to ``cap`` at the tail."""
    import jax.numpy as jnp

    flat = (c != SENTINEL).reshape(-1)
    csum = jnp.cumsum(flat.astype(jnp.int32))
    n_total = csum[-1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    sel = jnp.minimum(jnp.searchsorted(csum, targets), flat.shape[0] - 1)
    valid = targets <= n_total
    return (
        jnp.where(valid, c[sel], SENTINEL),
        jnp.where(valid, p[sel], -1),
        jnp.where(valid, s[sel], 0),
    )


_COMPACT_QUANTUM = 1 << 22


def chrom_anchors_dev(
    chrom: PackedChromosome, k: int = 15, mod: int = 16,
    tile_bases: int = 1 << 23,
) -> DevAnchors:
    """Sampled anchors for a whole chromosome, kept ON DEVICE.

    Returns a :class:`DevAnchors` (position order, compacted). Feeds
    :func:`match_anchors_dev`, which joins the two sides on device so only
    MATCHED pairs ever cross the link (through the remote tunnel the
    per-tile anchor downloads of :func:`chrom_anchors` cost ~7 s per 26 Mb
    chromosome; matches are ~10x smaller). Compaction matters at scale: a
    667 Mb chromosome's per-tile padding would otherwise carry ~80 M
    entries (~48% pads) into every downstream sort — the padded 6-operand
    join program peaked past device memory and crashed the TPU worker."""
    import jax
    import jax.numpy as jnp

    n_pos_words = tile_bases // 16
    n_words = tile_words_for(tile_bases, k)
    base_cap = max(tile_bases // mod * 2, 1 << 12)
    parts_c, parts_p, parts_s = [], [], []
    total = 0
    for start in range(0, chrom.length, tile_bases):
        w0 = start // 16
        avail = min(n_words, chrom.packed.shape[0] - w0)
        if avail <= 0:
            continue
        words = np.zeros(n_words, dtype=np.int32)
        vwords = np.zeros(n_words, dtype=np.int32)
        words[:avail] = chrom.packed[w0 : w0 + avail]
        vwords[:avail] = chrom.vmask[w0 : w0 + avail]
        cap = base_cap
        while True:
            c, p, s, n_total = sampled_anchors(
                words, vwords, k=k, n_pos_words=n_pos_words, mod=mod, cap=cap
            )
            n = int(n_total)
            if n <= cap or cap >= (1 << 24):
                break
            cap *= 4
        p = jnp.where(p >= 0, p + np.int32(start), -1)
        parts_c.append(c)
        parts_p.append(p)
        parts_s.append(s)
        total += min(n, cap)
    if not parts_c:
        z = jnp.full(1, SENTINEL, jnp.int32)
        return DevAnchors(z, jnp.full(1, -1, jnp.int32),
                          jnp.zeros(1, jnp.int32), 0)
    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs)  # noqa: E731
    c, p, s = cat(parts_c), cat(parts_p), cat(parts_s)
    cap_r = max(_COMPACT_QUANTUM, -(-total // _COMPACT_QUANTUM) * _COMPACT_QUANTUM)
    if cap_r < c.shape[0]:
        c, p, s = _compact3(c, p, s, cap=cap_r)
    return DevAnchors(c, p, s, total)


@jax.jit
def _ss_left_right(keys, queries):
    """left and right insertion ranks of ``queries`` in sorted ``keys``.

    Kept as its own small program ON PURPOSE: the join used to run as one
    fused program (four searchsorteds + cumsum at ~42 M elements) and that
    program reproducibly crashed the TPU worker ("kernel fault") even on
    synthetic data, while the exact same ops run fine as separate
    programs (tools/probe_match_crash2.py bisected this). The join is
    therefore deliberately staged into proven-size programs."""
    import jax.numpy as jnp

    return (
        jnp.searchsorted(keys, queries),
        jnp.searchsorted(keys, queries, side="right"),
    )


@functools.partial(jax.jit, static_argnames=("max_occ",))
def _combine_runs(qc, q_occ, lo, hi, *, max_occ: int):
    """Kept-run prefix sums (elementwise + one cumsum; see _ss_left_right
    for why this is a separate program). Returns (csum, n_pairs)."""
    import jax.numpy as jnp

    runs = hi - lo
    keep = (runs > 0) & (runs <= max_occ) & (q_occ <= max_occ) & (qc != SENTINEL)
    csum = jnp.cumsum(jnp.where(keep, runs, 0))
    return csum, csum[-1]


@functools.partial(jax.jit, static_argnames=("window",))
def _match_emit(qp, qs, tp_s, ts_s, lo, csum, offset, *, window: int):
    """Emit one fixed-size window of joined pairs, packed for download.

    Returns (qpos int32, packed int32) where packed = tpos | rel << 31 —
    8 bytes per pair instead of 12 through the 1-3 MB/s tunnel. ``offset``
    is dynamic, so ONE compiled program covers every window of every pair
    at this window size. Invalid rows have qpos == -1."""
    import jax.numpy as jnp

    n_pairs = csum[-1]
    t_ids = offset + jnp.arange(window, dtype=jnp.int32)
    qi = jnp.searchsorted(csum, t_ids + 1)
    qi_c = jnp.minimum(qi, qp.shape[0] - 1)
    base = jnp.where(qi_c > 0, csum[jnp.maximum(qi_c - 1, 0)], 0)
    tj = jnp.minimum(lo[qi_c] + (t_ids - base), tp_s.shape[0] - 1)
    valid = t_ids < n_pairs
    out_q = jnp.where(valid, qp[qi_c], -1)
    rel = (qs[qi_c] != ts_s[tj]).astype(jnp.int32)
    out_packed = jnp.where(valid, tp_s[tj] | (rel << 31), 0)
    return out_q, out_packed


MATCH_EMIT_WINDOW = 1 << 22  # 4.2M pairs = 33 MB per downloaded window


def match_anchors_dev(qa: DevAnchors, ta: DevAnchors, max_occ: int = 8):
    """Join device anchor sets -> host (qpos, tpos, rel), (q, t)-sorted.

    ``qa``/``ta`` are :func:`chrom_anchors_dev` results. Pair set is
    identical to the host :func:`match_anchors`; order is (qpos, tpos)
    ascending — the same order the host path produces (q anchors are
    position-ordered and each q's t-run ascending).

    The join is deliberately staged into several SMALL programs (cached
    per-chromosome sort + occurrence counts, per-pair rank lookups, one
    combine, windowed emit): the old single fused join program crashed the
    TPU worker at 667 Mb chromosome scale (see _ss_left_right), and the
    staging also removes the cap-retry re-execution and lets the sorted /
    occurrence arrays amortize across a homoeologous set's pairs. Pairs
    stream down in fixed windows packed to 8 bytes each; all windows are
    dispatched before the first download so device compute overlaps the
    tunnel."""
    q_occ = qa.occ()
    tc_s, tp_s, ts_s = ta.sorted3()
    lo, hi = _ss_left_right(tc_s, qa.c)
    csum, n_pairs = _combine_runs(qa.c, q_occ, lo, hi, max_occ=max_occ)
    n = int(n_pairs)
    if n == 0:
        z32 = np.zeros(0, np.int32)
        return z32.astype(np.int64), z32.astype(np.int64), z32
    window = MATCH_EMIT_WINDOW
    handles = [
        _match_emit(qa.p, qa.s, tp_s, ts_s, lo, csum, np.int32(w * window),
                    window=window)
        for w in range(-(-n // window))
    ]
    qs_h, ts_h = [], []
    for oq, op in handles:
        qs_h.append(np.asarray(oq))
        ts_h.append(np.asarray(op))
    q = np.concatenate(qs_h)
    packed = np.concatenate(ts_h)
    m = q >= 0
    q, packed = q[m], packed[m].view(np.uint32)
    t = (packed & np.uint32(0x7FFFFFFF)).astype(np.int64)
    r = (packed >> np.uint32(31)).astype(np.int32)
    order = np.lexsort((t, q))
    return q[order].astype(np.int64), t[order], r[order]


def match_anchors(
    qc: np.ndarray, qp: np.ndarray, qs: np.ndarray,
    tc: np.ndarray, tp: np.ndarray, ts: np.ndarray,
    max_occ: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (qpos, tpos, rel_strand) pairs with equal canonical codes.

    Codes occurring more than ``max_occ`` times in either sequence are
    skipped (repeat families), like minimap2's high-frequency seed filter —
    without this, scattered repeat copies chain into spurious blocks.
    """
    order = np.argsort(tc, kind="stable")
    tc_s, tp_s, ts_s = tc[order], tp[order], ts[order]
    # occurrence count of each code within the query itself
    qsort = np.sort(qc)
    q_occ = np.searchsorted(qsort, qc, side="right") - np.searchsorted(
        qsort, qc, side="left"
    )
    lo = np.searchsorted(tc_s, qc, side="left")
    hi = np.searchsorted(tc_s, qc, side="right")
    runs = hi - lo
    keep = (runs > 0) & (runs <= max_occ) & (q_occ <= max_occ)
    idx_q = np.flatnonzero(keep)
    if idx_q.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int32)
    counts = runs[idx_q]
    q_rep = np.repeat(idx_q, counts)
    # vectorized range expansion: concatenate(arange(l, h) for each run)
    # without the per-run Python loop (it cost tens of seconds at ~1M runs)
    starts = lo[idx_q].astype(np.int64)
    total = int(counts.sum())
    step = np.ones(total, dtype=np.int64)
    csum = np.cumsum(counts)
    step[0] = starts[0]
    if counts.size > 1:
        step[csum[:-1]] = starts[1:] - (starts[:-1] + counts[:-1] - 1)
    t_flat = np.cumsum(step)
    rel = (qs[q_rep] != ts_s[t_flat]).astype(np.int32)  # 1 = opposite strand
    return qp[q_rep], tp_s[t_flat], rel
