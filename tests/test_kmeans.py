import jax
import numpy as np
import pytest
from sklearn import metrics as skm
from sklearn.cluster import KMeans

from subphaser_tpu.ops.kmeans import (
    adjusted_rand_score,
    bootstrap,
    canonical_labels,
    kmeans_fit,
    v_measure_score,
    zscore,
)
from tests.oracle import sort_subgenomes


def make_blobs(rng, n_chrom=21, n_feat=400, k=3):
    """Chromosome-like data: k groups with distinct k-mer signatures."""
    assign = np.array([i % k for i in range(n_chrom)])
    centers = rng.normal(0, 3.0, size=(k, n_feat))
    x = centers[assign] + rng.normal(0, 0.5, size=(n_chrom, n_feat))
    return x.astype(np.float32), assign


def test_kmeans_matches_sklearn_partition():
    rng = np.random.default_rng(0)
    x, truth = make_blobs(rng)
    xn = np.asarray(zscore(x, axis=0))
    labels, _ = kmeans_fit(xn, jax.random.PRNGKey(0), 3)
    labels = np.asarray(labels)
    sk = KMeans(n_clusters=3, n_init=10, random_state=0).fit(xn).labels_
    assert skm.adjusted_rand_score(labels, sk) == 1.0
    assert skm.adjusted_rand_score(labels, truth) == 1.0


def test_canonical_labels_matches_reference():
    rng = np.random.default_rng(3)
    chrs = [f"chr{i:02d}" for i in range(12)]
    order = np.argsort(chrs)
    for _ in range(20):
        labels = rng.integers(0, 4, size=12)
        expected = sort_subgenomes(labels.tolist(), chrs)
        got = np.asarray(canonical_labels(labels, order, 4))
        np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_sklearn(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 3, size=30)
    b = rng.integers(0, 3, size=30)
    assert np.asarray(adjusted_rand_score(a, b, 3)) == pytest.approx(
        skm.adjusted_rand_score(a, b), abs=1e-5
    )
    assert np.asarray(v_measure_score(a, b, 3)) == pytest.approx(
        skm.v_measure_score(a, b), abs=1e-5
    )


def test_bootstrap_confident_on_clean_data():
    rng = np.random.default_rng(1)
    x, truth = make_blobs(rng, n_chrom=12, n_feat=600, k=2)
    xn = np.asarray(zscore(x, axis=0))
    chrs = [f"c{i}" for i in range(12)]
    order = np.argsort(chrs)
    labels, _ = kmeans_fit(xn, jax.random.PRNGKey(0), 2)
    main = canonical_labels(labels, order, 2)
    support, ari, vm = bootstrap(
        xn, main, order, jax.random.PRNGKey(7),
        n_clusters=2, replicates=50, n_resample=50,
    )
    assert np.all(np.asarray(support) >= 95)
    assert float(ari) > 0.95
    assert float(vm) > 0.95
