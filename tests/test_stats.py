import numpy as np
import pytest
from scipy import stats as sps

from subphaser_tpu.ops import stats as dstats
from subphaser_tpu.ops import stats_host as hstats


def test_fisher_right_tail_matches_scipy():
    rng = np.random.default_rng(0)
    tables = rng.integers(0, 80, size=(200, 4))
    p = hstats.fisher_right_tail(tables[:, 0], tables[:, 1], tables[:, 2], tables[:, 3])
    for i, (a, b, c, d) in enumerate(tables):
        expected = sps.fisher_exact([[a, b], [c, d]], alternative="greater")[1]
        assert p[i] == pytest.approx(expected, rel=1e-9), (a, b, c, d)


def test_fisher_enrich_matches_reference_layout():
    counts = np.array([[30, 2, 1], [5, 5, 5], [0, 40, 0]])
    p = hstats.fisher_enrich_pvals(counts)
    total = counts.sum(axis=0)
    grand = total.sum()
    for r in range(3):
        rowsum = counts[r].sum()
        for i in range(3):
            x11 = counts[r, i]
            x12 = rowsum - x11
            x21 = min(total[i] - x11, hstats.MAX_INT)
            x22 = min(grand - x21 - x12, hstats.MAX_INT)
            expected = sps.fisher_exact([[x11, x12], [x21, x22]], alternative="greater")[1]
            assert p[r, i] == pytest.approx(expected, rel=1e-9)


def test_device_fisher_close_to_host():
    # float32 lgamma limits the device version to ~percent-level relative
    # accuracy (decision-compatible away from knife-edge ties); the file
    # output pipeline always uses the host float64 path.
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 500, size=(20, 3))
    ph = hstats.fisher_enrich_pvals(counts)
    pd = np.asarray(dstats.fisher_enrich_pvals(counts))
    m = ph > 1e-30
    np.testing.assert_allclose(pd[m], ph[m], rtol=5e-2, atol=1e-4)
    # and decisions at the 0.05 gate agree
    np.testing.assert_array_equal(pd[m] <= 0.05, ph[m] <= 0.05)


def test_bh_fdr_matches_scipy():
    rng = np.random.default_rng(2)
    p = rng.random(100)
    adj = hstats.bh_fdr(p)
    expected = sps.false_discovery_control(p, method="bh")
    np.testing.assert_allclose(adj, expected, rtol=1e-12)
    adj_dev = np.asarray(dstats.bh_fdr(p.astype(np.float32)))
    np.testing.assert_allclose(adj_dev, expected, rtol=1e-5)


def test_ttest_from_stats_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, size=(50, 4))
    y = rng.normal(0.5, 1.2, size=(50, 6))
    p = np.asarray(
        dstats.ttest_ind_from_stats(
            x.mean(1), x.var(1, ddof=1), np.full(50, 4.0),
            y.mean(1), y.var(1, ddof=1), np.full(50, 6.0),
        )
    )
    expected = sps.ttest_ind(x, y, axis=1).pvalue
    np.testing.assert_allclose(p, expected, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("method", ["ttest_ind", "mannwhitneyu", "kruskal"])
def test_test_top2_matches_scipy_rowwise(method):
    rng = np.random.default_rng(4)
    n_chrom = 9
    freqs = rng.random((40, n_chrom))
    group_idx = [np.array([0, 1, 2]), np.array([3, 4, 5]), np.array([6, 7, 8])]
    top, pvals, means = hstats.test_top2(freqs, group_idx, method=method)
    test = getattr(sps, method)
    for i in range(40):
        m = [freqs[i, g].mean() for g in group_idx]
        order = np.argsort(-np.array(m), kind="stable")
        assert top[i] == order[0]
        expected = test(freqs[i, group_idx[order[0]]], freqs[i, group_idx[order[1]]]).pvalue
        assert pvals[i] == pytest.approx(expected, rel=1e-9)
        np.testing.assert_allclose(means[i], m)


def test_device_mannwhitneyu_matches_scipy_asymptotic():
    rng = np.random.default_rng(6)
    x = rng.integers(0, 10, size=(50, 5)).astype(np.float32)  # ties likely
    y = rng.integers(0, 10, size=(50, 7)).astype(np.float32)
    p = np.asarray(dstats.mannwhitneyu(x, y))
    for i in range(50):
        expected = sps.mannwhitneyu(
            x[i], y[i], alternative="two-sided", method="asymptotic"
        ).pvalue
        assert p[i] == pytest.approx(expected, rel=1e-4), i


def test_device_kruskal_matches_scipy():
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 12, size=(40, 4)).astype(np.float32)
    g2 = rng.integers(0, 12, size=(40, 5)).astype(np.float32)
    g3 = rng.integers(0, 12, size=(40, 3)).astype(np.float32)
    allv = np.concatenate([g1, g2, g3], axis=1)
    p = np.asarray(dstats.kruskal(allv, np.array([4, 5, 3])))
    for i in range(40):
        try:
            expected = sps.kruskal(g1[i], g2[i], g3[i]).pvalue
        except ValueError:  # all values identical
            continue
        assert p[i] == pytest.approx(expected, rel=1e-4), i
