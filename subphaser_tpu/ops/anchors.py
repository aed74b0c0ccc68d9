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


def chrom_anchors_dev(
    chrom: PackedChromosome, k: int = 15, mod: int = 16,
    tile_bases: int = 1 << 23,
):
    """Sampled anchors for a whole chromosome, kept ON DEVICE.

    Returns (codes, pos, strand) device arrays (SENTINEL/-1 padded,
    position order) and the total count. Feeds :func:`match_anchors_dev`,
    which joins the two sides on device so only MATCHED pairs ever cross
    the link (through the remote tunnel the per-tile anchor downloads of
    :func:`chrom_anchors` cost ~7 s per 26 Mb chromosome; matches are
    ~10x smaller)."""
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
        import jax.numpy as jnp

        z = jnp.full(1, SENTINEL, jnp.int32)
        return z, jnp.full(1, -1, jnp.int32), jnp.zeros(1, jnp.int32), 0
    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs)  # noqa: E731
    return cat(parts_c), cat(parts_p), cat(parts_s), total


@functools.partial(jax.jit, static_argnames=("cap", "max_occ"))
def _match_dev(qc, qp, qs, tc, tp, ts, *, cap: int, max_occ: int):
    """Device join of two anchor sets on equal canonical codes.

    Mirrors :func:`match_anchors` exactly (same max_occ filters); the
    variable-length run expansion uses the cumsum + searchsorted
    compaction pattern (no scatter). Returns (qpos, tpos, rel) int32
    arrays of ``cap`` entries (-1 padded) + the true pair count."""
    import jax
    import jax.numpy as jnp

    tc_s, tp_s, ts_s = jax.lax.sort((tc, tp, ts), num_keys=1)
    qc_sorted = jnp.sort(qc)
    q_occ = jnp.searchsorted(qc_sorted, qc, side="right") - jnp.searchsorted(
        qc_sorted, qc
    )
    lo = jnp.searchsorted(tc_s, qc)
    hi = jnp.searchsorted(tc_s, qc, side="right")
    runs = hi - lo
    keep = (runs > 0) & (runs <= max_occ) & (q_occ <= max_occ) & (qc != SENTINEL)
    c = jnp.where(keep, runs, 0)
    csum = jnp.cumsum(c)
    n_pairs = csum[-1]
    t_ids = jnp.arange(cap, dtype=jnp.int32)
    qi = jnp.searchsorted(csum, t_ids + 1)
    qi_c = jnp.minimum(qi, qc.shape[0] - 1)
    base = csum[qi_c] - c[qi_c]
    tj = jnp.minimum(lo[qi_c] + (t_ids - base), tc_s.shape[0] - 1)
    valid = t_ids < n_pairs
    out_q = jnp.where(valid, qp[qi_c], -1)
    out_t = jnp.where(valid, tp_s[tj], -1)
    out_r = jnp.where(valid, (qs[qi_c] != ts_s[tj]).astype(jnp.int32), 0)
    return out_q, out_t, out_r, n_pairs


def match_anchors_dev(qa, ta, max_occ: int = 8):
    """Join device anchor sets -> host (qpos, tpos, rel), (q, t)-sorted.

    ``qa``/``ta`` are :func:`chrom_anchors_dev` results. Pair set is
    identical to the host :func:`match_anchors`; order is (qpos, tpos)
    ascending — the same order the host path produces (q anchors are
    position-ordered and each q's t-run ascending)."""
    import jax.numpy as jnp

    qc, qp, qs, _nq = qa
    tc, tp, ts, _nt = ta
    cap = 1 << 17
    while True:
        oq, ot, orr, n_pairs = _match_dev(
            qc, qp, qs, tc, tp, ts, cap=cap, max_occ=max_occ
        )
        n = int(n_pairs)
        if n <= cap or cap >= (1 << 26):
            break
        cap = max(cap * 4, 1 << max(n - 1, 1).bit_length())
    chunk = min(ANCHOR_DOWNLOAD_CHUNK, cap)
    n_chunks = max(1, -(-min(n, cap) // chunk))
    parts = [
        _slice3(oq, ot, orr, np.int32(i * chunk), chunk)
        for i in range(n_chunks)
    ]
    q = np.concatenate([np.asarray(x[0]) for x in parts])
    t = np.concatenate([np.asarray(x[1]) for x in parts])
    r = np.concatenate([np.asarray(x[2]) for x in parts])
    m = q >= 0
    q, t, r = q[m], t[m], r[m]
    order = np.lexsort((t, q))
    return (q[order].astype(np.int64), t[order].astype(np.int64),
            r[order].astype(np.int32))


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
