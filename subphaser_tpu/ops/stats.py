"""Device (jnp) statistical kernels for fused on-device pipelines.

Float32 counterparts of ops/stats_host.py: batched one-sided Fisher exact via
a log-space hypergeometric tail recurrence (replaces the C ``fisher``
extension, reference Stats.py:14-31), Student t-test (reference
Cluster.py:189-192), and BH-FDR. The file-writing pipeline uses the host
float64 versions for decision parity; these run inside jit/shard_map graphs
where approximate p-values suffice (same decisions away from knife-edge ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammaln

MAX_INT = 2147483647 // 10


def _lpmf_hypergeom(x, m, n1, k1):
    """log pmf of hypergeom: P(X = x) with population m, successes n1, draws k1."""

    def lc(a, b):
        return gammaln(a + 1.0) - gammaln(b + 1.0) - gammaln(a - b + 1.0)

    return lc(n1, x) + lc(m - n1, k1 - x) - lc(m, k1)


@functools.partial(jax.jit, static_argnames=("max_terms",))
def fisher_right_tail(a, b, c, d, max_terms: int = 16384):
    """P(X >= a) for 2x2 tables, float32, via upward pmf recurrence.

    pmf(x+1)/pmf(x) = (n1-x)(k1-x) / ((x+1)(m-n1-k1+x+1)); starting at the
    observed cell the ratio is < 1 for enriched tables, so the series
    converges geometrically; ``max_terms`` caps the scan.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    m = a + b + c + d
    n1 = a + b
    k1 = a + c
    upper = jnp.minimum(n1, k1)
    lp0 = _lpmf_hypergeom(a, m, n1, k1)

    def body(carry, i):
        log_sum, log_term = carry
        x = a + i
        ratio = ((n1 - x) * (k1 - x)) / ((x + 1.0) * (m - n1 - k1 + x + 1.0))
        valid = x < upper
        log_term_next = jnp.where(
            valid & (ratio > 0), log_term + jnp.log(jnp.maximum(ratio, 1e-38)), -jnp.inf
        )
        log_sum = jnp.logaddexp(log_sum, log_term_next)
        return (log_sum, log_term_next), None

    init = (lp0, lp0)
    (log_sum, _), _ = jax.lax.scan(body, init, jnp.arange(max_terms, dtype=jnp.float32))
    p = jnp.exp(log_sum)
    return jnp.clip(jnp.where(a > upper, 0.0, p), 0.0, 1.0)


@jax.jit
def fisher_enrich_pvals(counts):
    """Device version of stats_host.fisher_enrich_pvals (float32)."""
    counts = jnp.asarray(counts, jnp.float32)
    total = counts.sum(axis=0)
    rowsum = counts.sum(axis=1, keepdims=True)
    grand = total.sum()
    x11 = counts
    x12 = rowsum - x11
    x21 = jnp.minimum(total[None, :] - x11, float(MAX_INT))
    x22 = jnp.minimum(grand - x21 - x12, float(MAX_INT))
    return fisher_right_tail(x11, x12, x21, x22)


@jax.jit
def ttest_ind_from_stats(m1, v1, n1, m2, v2, n2):
    """Two-sided pooled-variance t-test p-value (scipy ttest_ind parity)."""
    df = n1 + n2 - 2.0
    sp2 = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / jnp.maximum(df, 1e-30)
    denom = jnp.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
    t = (m1 - m2) / denom
    x = df / (df + t * t)
    p = betainc(df / 2.0, 0.5, x)
    # zero pooled variance: equal means -> nan (reference keeps those k-mers);
    # unequal means -> p = 0
    p = jnp.where(denom == 0, jnp.where(m1 == m2, jnp.nan, 0.0), p)
    return p


def _rank_avg(values):
    """Average ranks (ties averaged) along the last axis via pairwise
    compares — group sizes are chromosome counts, so n is tiny."""
    v = values[..., :, None]
    w = values[..., None, :]
    less = jnp.sum(w < v, axis=-1)
    equal = jnp.sum(w == v, axis=-1)
    return less + (equal + 1.0) / 2.0


@jax.jit
def mannwhitneyu(x, y):
    """Two-sided Mann-Whitney U p-value, normal approximation with tie
    correction and continuity (scipy mannwhitneyu(method='asymptotic')
    parity; the host path uses scipy's exact method where scipy does).
    x: (B, n1), y: (B, n2).
    """
    n1 = x.shape[-1]
    n2 = y.shape[-1]
    both = jnp.concatenate([x, y], axis=-1)
    ranks = _rank_avg(both)
    r1 = jnp.sum(ranks[..., :n1], axis=-1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = jnp.maximum(u1, n1 * n2 - u1)
    mu = n1 * n2 / 2.0
    n = n1 + n2
    # tie correction: sum over tie groups of (t^3 - t)
    counts = jnp.sum(both[..., :, None] == both[..., None, :], axis=-1)
    tie_sum = jnp.sum((counts * counts - 1.0), axis=-1)  # sum_i (t_i^2 - 1)
    sigma2 = n1 * n2 / 12.0 * ((n + 1.0) - tie_sum / (n * (n - 1.0)))
    sigma = jnp.sqrt(jnp.maximum(sigma2, 1e-30))
    z = (u - mu - 0.5) / sigma
    p = jax.scipy.special.erfc(jnp.maximum(z, 0.0) / jnp.sqrt(2.0))
    return jnp.clip(p, 0.0, 1.0)


@jax.jit
def kruskal(groups_values, group_sizes):
    """Kruskal-Wallis H-test p-value (chi2 approximation, scipy parity).

    groups_values: (B, n_total) concatenated group observations;
    group_sizes: static-like int array (G,) with sum == n_total.
    """
    ranks = _rank_avg(groups_values)
    n = groups_values.shape[-1]
    sizes = jnp.asarray(group_sizes)
    g = sizes.shape[0]
    idx = jnp.arange(n)
    group_of = jnp.sum(idx[None, :] >= jnp.cumsum(sizes)[:, None], axis=0)  # (n,)
    onehot = jax.nn.one_hot(group_of, g, dtype=ranks.dtype)
    r_sums = ranks @ onehot  # (B, G)
    h = 12.0 / (n * (n + 1.0)) * jnp.sum(r_sums**2 / sizes, axis=-1) - 3.0 * (n + 1.0)
    # tie correction
    counts = jnp.sum(
        groups_values[..., :, None] == groups_values[..., None, :], axis=-1
    )
    tie_sum = jnp.sum(counts * counts - 1.0, axis=-1)
    correction = 1.0 - tie_sum / (n**3 - n)
    h = h / jnp.maximum(correction, 1e-30)
    df = g - 1.0
    return jax.scipy.special.gammaincc(df / 2.0, jnp.maximum(h, 0.0) / 2.0)


@jax.jit
def bh_fdr(pvals):
    p = jnp.asarray(pvals)
    n = p.shape[0]
    order = jnp.argsort(p, stable=True)
    ranked = p[order] * n / jnp.arange(1, n + 1, dtype=p.dtype)
    adj = jnp.flip(jax.lax.cummin(jnp.flip(ranked)))
    adj = jnp.clip(adj, 0.0, 1.0)
    return jnp.zeros_like(adj).at[order].set(adj)
