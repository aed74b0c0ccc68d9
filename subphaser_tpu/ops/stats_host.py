"""Host-side float64 statistics with exact reference parity.

The decision gates of the reference compare p-values against thresholds and
against each other (reference Stats.py:181-192), so the file-output path
computes p-values in float64 on host — the arithmetic is trivial next to the
device counting work. Device (float32) versions for fused on-device pipelines
live in ops/stats.py.

- fisher_right_tail: one-sided (right) Fisher exact, vectorized, equal to the
  C ``fisher`` extension used at reference Stats.py:26.
- ttest_top2 etc.: the reference's per-k-mer "top SG vs 2nd SG" test
  (reference Cluster.py:178-194) batched by (top, second) group pair.
- bh_fdr: Benjamini-Hochberg, equal to statsmodels multipletests 'fdr_bh'
  (reference Stats.py:11-12).
"""

from __future__ import annotations

import numpy as np
from scipy import stats as sps

# reference clamps the large cells before the test (Stats.py:9,24-25)
MAX_INT = 2147483647 // 10


def fisher_right_tail(a, b, c, d):
    """P(X >= a) for 2x2 tables [[a, b], [c, d]], vectorized float64."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    c = np.asarray(c, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    m = a + b + c + d
    n1 = a + b  # row 1 margin
    k1 = a + c  # col 1 margin
    return sps.hypergeom.sf(a - 1, m, n1, k1)


def fisher_enrich_pvals(counts: np.ndarray) -> np.ndarray:
    """Reference fisher_test (Stats.py:14-31) over a (rows, SG) count matrix.

    For row r and column i: table is
      x11 = counts[r, i], x12 = rowsum - x11,
      x21 = total[i] - x11, x22 = grand - x21 - x12,
    with x21, x22 clamped to MAX_INT//10. Returns (rows, SG) right-tail p.
    """
    counts = np.asarray(counts, dtype=np.int64)
    total = counts.sum(axis=0)  # (SG,)
    rowsum = counts.sum(axis=1, keepdims=True)
    grand = total.sum()
    x11 = counts
    x12 = rowsum - x11
    # clamp order matters: the reference derives x22 from the UNclamped x21
    # and only then clamps both (Stats.py:24-25)
    x21u = total[None, :] - x11
    x22 = np.minimum(grand - x21u - x12, MAX_INT)
    x21 = np.minimum(x21u, MAX_INT)
    return fisher_right_tail(x11, x12, x21, x22)


def bh_fdr(pvals: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted p-values (statsmodels 'fdr_bh' parity)."""
    p = np.asarray(pvals, dtype=np.float64)
    n = p.size
    order = np.argsort(p, kind="stable")
    ranked = p[order] * n / np.arange(1, n + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    adj = np.clip(adj, 0, 1)
    out = np.empty_like(adj)
    out[order] = adj
    return out


# ---------------------------------------------------------------------------
# per-k-mer "top group vs second group" tests (reference Cluster.py:178-194)
# ---------------------------------------------------------------------------
def _rank_groups(freqs: np.ndarray, group_idx: list[np.ndarray]):
    """Group means + (top, second) group per row, reproducing the reference's
    stable sort of groups by descending mean (Python sorted is stable, and
    groups are visited in sorted-SG-name order)."""
    means = np.stack([freqs[:, gi].mean(axis=1) for gi in group_idx], axis=1)
    # stable argsort on -mean keeps SG-name order among ties, like sorted()
    order = np.argsort(-means, axis=1, kind="stable")
    return means, order[:, 0], order[:, 1]


def test_top2(
    freqs: np.ndarray,
    group_idx: list[np.ndarray],
    method: str = "ttest_ind",
):
    """For each row: test values of the top-mean group vs the 2nd group.

    Returns (top_group int array, pvals float64 array, means (B, n_groups)).
    ``method``: ttest_ind | kruskal | wilcoxon | mannwhitneyu (scipy names,
    default args — matching `eval('stats.%s')` at reference Cluster.py:160).
    """
    freqs = np.asarray(freqs, dtype=np.float64)
    b = freqs.shape[0]
    means, top, second = _rank_groups(freqs, group_idx)
    pvals = np.full(b, np.nan)
    test = getattr(sps, method)
    # batch rows sharing the same (top, second) pair -> one vectorized call
    pair_key = top * len(group_idx) + second
    for key in np.unique(pair_key):
        rows = np.flatnonzero(pair_key == key)
        g1 = group_idx[top[rows[0]]]
        g2 = group_idx[second[rows[0]]]
        x = freqs[np.ix_(rows, g1)]
        y = freqs[np.ix_(rows, g2)]
        if method == "ttest_ind":
            res = sps.ttest_ind(x, y, axis=1)
            pvals[rows] = res.pvalue
        else:
            if method == "wilcoxon" and x.shape[1] != y.shape[1]:
                # scipy's wilcoxon is a paired test; the reference passes
                # the same unequal groups and crashes identically
                raise ValueError(
                    "wilcoxon requires equally sized subgenome groups "
                    f"(got {x.shape[1]} vs {y.shape[1]}); use ttest_ind, "
                    "kruskal, or mannwhitneyu"
                )
            # rank tests: scipy supports axis too
            with np.errstate(all="ignore"):
                res = test(x, y, axis=1)
            pvals[rows] = np.atleast_1d(res.pvalue)
    return top, pvals, means
