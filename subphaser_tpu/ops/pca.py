"""PCA via the gram matrix (samples are chromosomes: n tiny, features huge).

Replaces sklearn.decomposition.PCA (reference Cluster.py:48-54). For
(n, F) data with n ~ 20 and F up to millions, the full SVD is wasteful;
the eigendecomposition of the (n, n) gram matrix of centered data gives the
same scores. Sign convention follows sklearn's svd_flip (largest-|loading|
component of each score column made positive) so plots are reproducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_components",))
def pca_fit_transform(x: jnp.ndarray, n_components: int):
    """Returns (scores (n, n_components), explained_variance_ratio)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    gram = xc @ xc.T  # (n, n)
    evals, evecs = jnp.linalg.eigh(gram)  # ascending
    evals = jnp.flip(evals, axis=0)
    evecs = jnp.flip(evecs, axis=1)
    evals = jnp.maximum(evals, 0.0)
    # scores = U * S where gram = U S^2 U^T
    scores = evecs * jnp.sqrt(evals)[None, :]
    # svd_flip (u-based): flip sign so max-|value| entry of each column is +
    idx = jnp.argmax(jnp.abs(scores), axis=0)
    signs = jnp.sign(scores[idx, jnp.arange(n)])
    signs = jnp.where(signs == 0, 1.0, signs)
    scores = scores * signs[None, :]
    total = jnp.maximum(jnp.sum(evals), 1e-30)
    ratio = evals / total
    return scores[:, :n_components], ratio[:n_components]
