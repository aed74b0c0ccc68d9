"""Jit-compiled k-means, canonical subgenome labeling, bootstrap, ARI/V-measure.

Replaces sklearn KMeans / resample / metrics (reference Cluster.py:17-143).
Samples are chromosomes (tiny n), features are differential k-mers (huge F):
distances are (n, F) @ (F, K) matmuls on the MXU; the 1000-replicate bootstrap
(reference Cluster.py:82-112) is a single ``vmap`` over resampled column
indices instead of 1000 sequential sklearn fits.

Parity notes:
- kmeans++ init with ``n_init`` restarts, best inertia kept (the reference's
  sklearn used the historical n_init=10 default).
- canonical label renumbering reproduces Cluster.sort_subgenomes
  (Cluster.py:119-126): clusters are renumbered by first appearance when
  chromosomes are visited in sorted-name order, making assignments
  init-order-insensitive.
- bootstrap resamples ``n_samples=replicates`` k-mer rows with replacement,
  reproducing the reference's quirk where the ``jackknife`` percentage is
  computed but unused (Cluster.py:85-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ppdist(x, centers):
    """Squared euclidean distances (n, K)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)
    return x2 + c2 - 2.0 * (x @ centers.T)


def _kmeanspp_init(x, key, n_clusters):
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(c, carry):
        centers, key = carry
        d2_all = _ppdist(x, centers)  # (n, K)
        filled = jnp.arange(n_clusters) < c
        d2 = jnp.min(jnp.where(filled[None, :], d2_all, jnp.inf), axis=1)
        d2 = jnp.maximum(d2, 0.0)  # numerical guard
        kc, key = jax.random.split(key)
        tot = jnp.sum(d2)
        probs = jnp.where(tot > 0, d2 / jnp.maximum(tot, 1e-30), 1.0 / n)
        idx = jax.random.choice(kc, n, p=probs)
        centers = jax.lax.dynamic_update_index_in_dim(centers, x[idx], c, 0)
        return centers, key

    centers, key = jax.lax.fori_loop(1, n_clusters, body, (centers, key))
    return centers


def _lloyd(x, centers, n_iter):
    n, _ = x.shape
    k = centers.shape[0]

    def step(_, centers):
        d2 = _ppdist(x, centers)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (n, K)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters keep their previous center (sklearn relocates the
        # farthest point; with kmeans++ restarts this is a rare tie-breaker)
        new = jnp.where(counts[:, None] > 0, new, centers)
        return new

    centers = jax.lax.fori_loop(0, n_iter, step, centers)
    d2 = _ppdist(x, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return labels, inertia


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_init", "n_iter"))
def kmeans_fit(x, key, n_clusters: int, n_init: int = 10, n_iter: int = 50):
    """K-means with kmeans++ init and n_init restarts -> (labels, inertia)."""
    keys = jax.random.split(key, n_init)

    def one(k):
        centers = _kmeanspp_init(x, k, n_clusters)
        return _lloyd(x, centers, n_iter)

    labels, inertias = jax.vmap(one)(keys)
    best = jnp.argmin(inertias)
    return labels[best], inertias[best]


def canonical_labels(labels, order, n_clusters: int):
    """Renumber cluster labels by first appearance in ``order``.

    ``order`` = argsort of chromosome names (int array (n,)). Reproduces
    Cluster.sort_subgenomes (reference Cluster.py:119-126).
    """
    labels_ord = labels[order]  # labels visited in sorted-chrom order
    n = labels.shape[0]
    positions = jnp.arange(n)
    onehot = jax.nn.one_hot(labels_ord, n_clusters, dtype=jnp.float32)
    first_pos = jnp.min(
        jnp.where(onehot > 0, positions[:, None].astype(jnp.float32), jnp.inf), axis=0
    )  # (K,)
    rank = jnp.argsort(jnp.argsort(first_pos))  # rank of each old label
    return rank[labels]


def zscore(data, axis=0):
    """Z-normalization matching Cluster.normalize_data (Cluster.py:76-80).

    Zero-variance columns are left centered at 0 instead of NaN (sklearn
    would reject the NaN matrix outright in the reference).
    """
    data = jnp.asarray(data)
    mean = data.mean(axis=axis)
    std = data.std(axis=axis)
    return (data - mean) / jnp.where(std > 0, std, 1.0)


# ---------------------------------------------------------------------------
# clustering agreement metrics (reference uses sklearn.metrics)
# ---------------------------------------------------------------------------
def _contingency(a, b, k: int):
    return (
        jax.nn.one_hot(a, k, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32).T
        @ jax.nn.one_hot(b, k, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    )


def _comb2(x):
    return x * (x - 1.0) / 2.0


def adjusted_rand_score(a, b, k: int):
    c = _contingency(a, b, k)
    n = jnp.sum(c)
    sum_ij = jnp.sum(_comb2(c))
    ai = jnp.sum(_comb2(jnp.sum(c, axis=1)))
    bj = jnp.sum(_comb2(jnp.sum(c, axis=0)))
    expected = ai * bj / _comb2(n)
    max_index = (ai + bj) / 2.0
    denom = max_index - expected
    return jnp.where(jnp.abs(denom) < 1e-12, 1.0, (sum_ij - expected) / denom)


def _entropy(p):
    p = p / jnp.maximum(jnp.sum(p), 1e-30)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0))


def v_measure_score(a, b, k: int, beta: float = 1.0):
    c = _contingency(a, b, k)
    n = jnp.sum(c)
    h_a = _entropy(jnp.sum(c, axis=1))
    h_b = _entropy(jnp.sum(c, axis=0))
    p = c / jnp.maximum(n, 1e-30)
    h_ab = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0))
    # H(A|B) = H(A,B) - H(B); homogeneity = 1 - H(A|B)/H(A)
    h_a_given_b = h_ab - h_b
    h_b_given_a = h_ab - h_a
    hom = jnp.where(h_a > 0, 1.0 - h_a_given_b / jnp.maximum(h_a, 1e-30), 1.0)
    com = jnp.where(h_b > 0, 1.0 - h_b_given_a / jnp.maximum(h_b, 1e-30), 1.0)
    denom = beta * hom + com
    return jnp.where(denom > 0, (1 + beta) * hom * com / jnp.maximum(denom, 1e-30), 0.0)


# ---------------------------------------------------------------------------
# bootstrap (reference Cluster.py:82-112)
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("n_clusters", "replicates", "n_resample", "n_init")
)
def bootstrap(
    data,              # (n_chrom, F) normalized
    main_labels,       # (n_chrom,) canonical labels
    order,             # (n_chrom,) argsort of chromosome names
    key,
    *,
    n_clusters: int,
    replicates: int = 1000,
    n_resample: int | None = None,
    n_init: int = 10,
):
    """Returns (support% per chrom int32, mean ARI, mean V-measure)."""
    if n_resample is None:
        n_resample = replicates  # reference quirk: n_samples=replicates
    f = data.shape[1]
    keys = jax.random.split(key, replicates)

    def one(k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (n_resample,), 0, f)
        sub = data[:, idx]
        labels, _ = kmeans_fit(sub, k2, n_clusters, n_init=n_init)
        labels = canonical_labels(labels, order, n_clusters)
        return (
            labels,
            adjusted_rand_score(main_labels, labels, n_clusters),
            v_measure_score(main_labels, labels, n_clusters),
        )

    all_labels, aris, vms = jax.vmap(one)(keys)
    same = jnp.sum(all_labels == main_labels[None, :], axis=0)
    support = (100 * same // replicates).astype(jnp.int32)
    return support, jnp.mean(aris), jnp.mean(vms)
