"""Vectorized differential k-mer filter.

Device reimplementation of the reference's per-k-mer worker loop
(reference Jellyfish.py:462-512, 611-648): for every k-mer

1. total-count window: keep iff ``min_freq <= sum(counts) <= max_freq``
2. per homoeologous set (config row): frequency of each column group
   (``sum(count)/sum(chrom_total)``, or raw counts with ``by_count``); the
   set votes "include" iff ``max_freq_group / (baseline_group + 1e-20)
   >= min_fold`` where baseline is the ``baseline``-th largest (1 = second
   highest, -1 = smallest)
3. keep iff the fraction of voting non-singleton sets >= ``ratio``

The group frequencies are one (B, C) x (C, G) matmul (MXU); the per-set
max/baseline selection is a tiny sort along a padded width axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class GroupSpec:
    """Dense encoding of the homoeologous-set structure (static per run)."""

    member: np.ndarray      # float32 (n_groups, n_chrom) 0/1 membership
    set_groups: np.ndarray  # int32 (n_sets, max_w) group index, -1 padded
    set_ncols: np.ndarray   # int32 (n_sets,) number of columns per set
    set_valid: np.ndarray   # bool (n_sets,) non-singleton sets

    @property
    def n_valid_sets(self) -> int:
        return int(self.set_valid.sum())


def make_group_spec(sg_indices: list[list[list[int]]], n_chrom: int) -> GroupSpec:
    """Build from config.group_indices output (list of sets of column groups)."""
    n_groups = sum(len(sg) for sg in sg_indices)
    max_w = max((len(sg) for sg in sg_indices), default=1)
    member = np.zeros((max(n_groups, 1), n_chrom), dtype=np.float32)
    set_groups = np.full((len(sg_indices), max_w), -1, dtype=np.int32)
    set_ncols = np.zeros(len(sg_indices), dtype=np.int32)
    set_valid = np.zeros(len(sg_indices), dtype=bool)
    g = 0
    for s, sg in enumerate(sg_indices):
        set_ncols[s] = len(sg)
        set_valid[s] = len(sg) > 1
        for w, col in enumerate(sg):
            for ci in col:
                member[g, ci] = 1.0
            set_groups[s, w] = g
            g += 1
    if not any(set_valid):
        raise ValueError("All homoeologous sets are singletons; nothing to phase")
    return GroupSpec(member=member, set_groups=set_groups,
                     set_ncols=set_ncols, set_valid=set_valid)


@functools.partial(jax.jit, static_argnames=("by_count", "baseline"))
def fold_votes(
    counts: jnp.ndarray,      # int32 (B, C)
    lengths: jnp.ndarray,     # float32 (C,) per-chrom total k-mer counts
    member: jnp.ndarray,      # float32 (G, C)
    set_groups: jnp.ndarray,  # int32 (S, W)
    set_ncols: jnp.ndarray,   # int32 (S,)
    set_valid: jnp.ndarray,   # bool (S,)
    *,
    min_fold: float,
    ratio: float,
    baseline: int = 1,
    by_count: bool = False,
):
    """Fold-change gate per k-mer row -> bool (B,) mask.

    (The total-count window is applied on host in exact int64; see
    differential_filter.)
    """
    cf = counts.astype(jnp.float32)
    gcount = cf @ member.T                       # (B, G)
    if by_count:
        gfreq = gcount
    else:
        glen = member @ lengths                  # (G,)
        # scale up so float32 keeps precision on tiny frequencies
        gfreq = gcount / glen * jnp.float32(1e6)

    pad = set_groups < 0
    gathered = jnp.where(
        pad[None, :, :],
        -jnp.inf,
        gfreq[:, jnp.clip(set_groups, 0)],
    )                                            # (B, S, W)
    desc = -jnp.sort(-gathered, axis=-1)
    top = desc[..., 0]
    if baseline < 0:
        bidx = set_ncols + baseline              # e.g. -1 -> smallest valid
    else:
        bidx = jnp.full_like(set_ncols, baseline)
    bidx = jnp.clip(bidx, 0, set_groups.shape[1] - 1)
    base = jnp.take_along_axis(desc, bidx[None, :, None], axis=-1)[..., 0]
    include = (top / (base + jnp.float32(1e-20))) >= min_fold  # (B, S)

    n_valid = jnp.sum(set_valid)
    votes = jnp.sum(include & set_valid[None, :], axis=1)
    return (votes.astype(jnp.float32) / n_valid.astype(jnp.float32)) >= ratio


def validate_baseline(spec: GroupSpec, baseline: int) -> None:
    """Reject -baseline values that fall outside every set's column range.

    The reference indexes ``freqs[baseline]`` on the per-set descending
    frequency list (Jellyfish.py:639-640) and raises IndexError for
    out-of-range values; the device kernel's clip would instead silently
    mis-filter, so the pipeline validates up front.
    """
    ncols = spec.set_ncols[spec.set_valid]
    if ncols.size == 0:
        return
    w = int(ncols.min())
    if baseline >= w or baseline < -w:
        raise ValueError(
            f"-baseline {baseline} is out of range for homoeologous sets with "
            f"as few as {w} column groups (valid: -{w}..{w - 1})"
        )


def fold_votes_host(
    counts: np.ndarray,
    lengths: np.ndarray,
    spec: GroupSpec,
    *,
    min_fold: float,
    ratio: float,
    baseline: int = 1,
    by_count: bool = False,
) -> np.ndarray:
    """Exact-parity float64 fold-change gate (host) -> bool (B,) mask.

    Reproduces the reference worker arithmetic (Jellyfish.py:611-648):
    group frequency = sum(count)/sum(length) in float64, descending sort,
    vote iff top/(freqs[baseline] + 1e-20) >= min_fold, keep iff the voting
    fraction of non-singleton sets >= ratio. The device float32 version
    (fold_votes) serves fused on-device steps; file-output decisions run
    here per the exact-parity rule.
    """
    validate_baseline(spec, baseline)
    counts = np.asarray(counts, dtype=np.float64)
    member = spec.member.astype(np.float64)
    gcount = counts @ member.T                       # (B, G)
    if by_count:
        gfreq = gcount
    else:
        glen = member @ np.asarray(lengths, dtype=np.float64)
        gfreq = gcount / glen
    pad = spec.set_groups < 0
    gathered = np.where(
        pad[None, :, :], -np.inf, gfreq[:, np.clip(spec.set_groups, 0, None)]
    )                                                # (B, S, W)
    desc = -np.sort(-gathered, axis=-1, kind="stable")
    top = desc[..., 0]
    if baseline < 0:
        bidx = spec.set_ncols + baseline
    else:
        bidx = np.full_like(spec.set_ncols, baseline)
    bidx = np.clip(bidx, 0, spec.set_groups.shape[1] - 1)
    base = np.take_along_axis(desc, bidx[None, :, None], axis=-1)[..., 0]
    include = (top / (base + 1e-20)) >= min_fold     # (B, S)
    votes = (include & spec.set_valid[None, :]).sum(axis=1)
    return votes / max(spec.n_valid_sets, 1) >= ratio


def differential_filter(
    counts,
    lengths,
    member,
    set_groups,
    set_ncols,
    set_valid,
    *,
    min_freq: float,
    max_freq: float,
    min_fold: float,
    ratio: float,
    baseline: int = 1,
    by_count: bool = False,
):
    """Full reference filter -> (diff_mask, fold_mask, tot) numpy arrays.

    Fold votes run on device; the total-count window is exact host int64
    (totals of a 14 Gb genome overflow int32).
    """
    fold_mask = np.asarray(
        fold_votes(
            jnp.asarray(counts),
            jnp.asarray(lengths, dtype=jnp.float32),
            member,
            set_groups,
            set_ncols,
            set_valid,
            min_fold=min_fold,
            ratio=ratio,
            baseline=baseline,
            by_count=by_count,
        )
    )
    tot = np.asarray(counts, dtype=np.int64).sum(axis=1)
    in_window = (tot >= min_freq) & (tot <= max_freq)
    return fold_mask & in_window, fold_mask, tot
