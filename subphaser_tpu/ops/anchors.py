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
    """
    canon = kmer_codes(words, vwords, k, n_pos_words)   # (16, W)
    fwd = forward_codes(words, vwords, k, n_pos_words)
    strand = (canon != fwd).astype(jnp.int32)
    p = jax.lax.broadcasted_iota(jnp.int32, canon.shape, 0)
    w = jax.lax.broadcasted_iota(jnp.int32, canon.shape, 1)
    pos = w * 16 + p
    take = (canon != SENTINEL) & (canon % mod == 0)
    flat = take.reshape(-1)
    n_total = jnp.sum(flat)
    (sel,) = jnp.where(flat, size=cap, fill_value=flat.shape[0])
    valid = sel < flat.shape[0]
    sel_c = jnp.minimum(sel, flat.shape[0] - 1)
    out_c = jnp.where(valid, canon.reshape(-1)[sel_c], SENTINEL)
    out_p = jnp.where(valid, pos.reshape(-1)[sel_c], -1)
    out_s = jnp.where(valid, strand.reshape(-1)[sel_c], 0)
    return out_c, out_p, out_s, n_total


def chrom_anchors(
    chrom: PackedChromosome, k: int = 15, mod: int = 16,
    tile_bases: int = 1 << 23,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sampled anchors for a whole chromosome (host-concatenated tiles)."""
    n_pos_words = tile_bases // 16
    n_words = tile_words_for(tile_bases, k)
    # expected anchors ~= tile/mod; 25% headroom (cap directly sizes the
    # device->host transfer through the tunnel)
    cap = tile_bases // mod + tile_bases // (mod * 4)
    codes, poss, strands = [], [], []
    for start in range(0, chrom.length, tile_bases):
        w0 = start // 16
        words = np.zeros(n_words, dtype=np.int32)
        vwords = np.zeros(n_words, dtype=np.int32)
        avail = min(n_words, chrom.packed.shape[0] - w0)
        if avail <= 0:
            continue
        words[:avail] = chrom.packed[w0 : w0 + avail]
        vwords[:avail] = chrom.vmask[w0 : w0 + avail]
        c, p, s, n_total = sampled_anchors(
            words, vwords, k=k, n_pos_words=n_pos_words, mod=mod, cap=cap
        )
        if int(n_total) > cap:
            from subphaser_tpu.utils.log import logger

            logger.warning(
                "anchor cap overflow on %s @%d: %d sampled > cap %d; "
                "alignment seeds truncated",
                chrom.name, start, int(n_total), cap,
            )
        c, p, s = np.asarray(c), np.asarray(p), np.asarray(s)
        m = c != SENTINEL
        codes.append(c[m])
        poss.append(p[m] + start)
        strands.append(s[m])
    if not codes:
        return (np.zeros(0, np.int32),) * 3
    return (
        np.concatenate(codes),
        np.concatenate(poss).astype(np.int64),
        np.concatenate(strands),
    )


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
    t_flat = np.concatenate(
        [np.arange(l, h) for l, h in zip(lo[idx_q], hi[idx_q])]
    )
    rel = (qs[q_rep] != ts_s[t_flat]).astype(np.int32)  # 1 = opposite strand
    return qp[q_rep], tp_s[t_flat], rel
