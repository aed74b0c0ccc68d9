"""Fused multi-chip phasing step under shard_map.

One jitted step runs the whole core pipeline across a 2-D mesh:

  tiles (sharded "data") -> canonical k-mer codes -> per-tile sort/RLE ->
  candidate-table match (table sharded "kmer") -> per-device partial
  chrom x k-mer counts (one MXU matmul) -> psum over "data" ->
  differential fold/window gates (shard-local over "kmer") ->
  feature-sharded k-means (distances psum'd over "kmer") ->
  canonical subgenome labels (replicated)

This is the TPU-native replacement for the reference's process pools + file
merges (reference Jellyfish.py:671-704, 439-460; Cluster.py:17-143): the
only communication is XLA collectives over ICI, not the filesystem.

The candidate table comes from a discovery pass (phase/spectrum on a shard of
tiles, or a previous run); given the table, this step is fully static-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from subphaser_tpu.ops.count import sort_rle
from subphaser_tpu.ops.kmer import SENTINEL, kmer_codes


# ---------------------------------------------------------------------------
# feature-sharded k-means (features = k-mers live on the "kmer" axis)
# ---------------------------------------------------------------------------
def _psum_kmer(x):
    return jax.lax.psum(x, "kmer")


def _sh_dist2(x, centers):
    """Squared distances with feature-sharded x/centers: psum partials."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)
    part = x2 + c2 - 2.0 * (x @ centers.T)
    return _psum_kmer(part)


def _sh_kmeanspp(x, key, n_clusters):
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(c, carry):
        centers, key = carry
        d2_all = _sh_dist2(x, centers)
        filled = jnp.arange(n_clusters) < c
        d2 = jnp.min(jnp.where(filled[None, :], d2_all, jnp.inf), axis=1)
        d2 = jnp.maximum(d2, 0.0)
        kc, key = jax.random.split(key)
        tot = jnp.sum(d2)
        probs = jnp.where(tot > 0, d2 / jnp.maximum(tot, 1e-30), 1.0 / n)
        idx = jax.random.choice(kc, n, p=probs)
        centers = jax.lax.dynamic_update_index_in_dim(centers, x[idx], c, 0)
        return centers, key

    centers, _ = jax.lax.fori_loop(1, n_clusters, body, (centers, key))
    return centers


def _sh_lloyd(x, centers, n_iter):
    k = centers.shape[0]

    def step(_, centers):
        labels = jnp.argmin(_sh_dist2(x, centers), axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)  # replicated (labels replicated)
        sums = onehot.T @ x               # feature-sharded, no comm needed
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, n_iter, step, centers)
    d2 = _sh_dist2(x, centers)
    return jnp.argmin(d2, axis=1), jnp.sum(jnp.min(d2, axis=1))


def _sh_kmeans(x, key, n_clusters, n_init=10, n_iter=50):
    keys = jax.random.split(key, n_init)

    def one(k):
        return _sh_lloyd(x, _sh_kmeanspp(x, k, n_clusters), n_iter)

    labels, inertias = jax.vmap(one)(keys)
    best = jnp.argmin(inertias)
    return labels[best]


def _canonical_labels(labels, order, n_clusters):
    labels_ord = labels[order]
    n = labels.shape[0]
    onehot = jax.nn.one_hot(labels_ord, n_clusters, dtype=jnp.float32)
    first_pos = jnp.min(
        jnp.where(onehot > 0, jnp.arange(n, dtype=jnp.float32)[:, None], jnp.inf), axis=0
    )
    rank = jnp.argsort(jnp.argsort(first_pos))
    return rank[labels]


# ---------------------------------------------------------------------------
# the fused step
# ---------------------------------------------------------------------------
def _tile_candidate_counts(words, vwords, cand_local, k, n_pos_words):
    """One tile -> counts over the local candidate shard (gather-only)."""
    codes = kmer_codes(words, vwords, k, n_pos_words)
    ucodes, counts = sort_rle(codes)
    m = cand_local.shape[0]
    n = ucodes.shape[0]
    di = jnp.searchsorted(ucodes, cand_local)
    di_c = jnp.minimum(di, n - 1)
    hit = (di < n) & (ucodes[di_c] == cand_local) & (cand_local != SENTINEL)
    return jnp.where(hit, counts[di_c], 0).astype(jnp.int32)


def _phase_step_local(
    words,        # (T_local, W) int32
    vwords,       # (T_local, W) int32
    chrom_onehot,  # (T_local, C) float32
    cand_local,   # (B_local,) int32, SENTINEL padded
    lengths,      # (C,) float32 per-chrom totals (replicated)
    member,       # (G, C) float32
    set_groups,   # (S, Wd) int32
    set_ncols,    # (S,) int32
    set_valid,    # (S,) bool
    order,        # (C,) int32 argsort of chromosome names
    key,
    *,
    k: int,
    n_pos_words: int,
    n_clusters: int,
    min_freq: float,
    max_freq: float,
    min_fold: float,
    ratio: float,
    baseline: int,
):
    # per-tile candidate counts, sequential over local tiles (bounded memory)
    def body(w_v):
        w, v = w_v
        return _tile_candidate_counts(w, v, cand_local, k, n_pos_words)

    tile_counts = jax.lax.map(body, (words, vwords))  # (T_local, B_local)

    # partial chrom x k-mer matrix: integer dot so counts stay exact above
    # 2^24 (a float32 MXU matmul would round totals and flip min/max_freq
    # window decisions vs the exact int64 host path)
    partial = jax.lax.dot_general(
        tile_counts.T,
        chrom_onehot.astype(jnp.int32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B_local, C) int32
    counts_i = jax.lax.psum(partial, "data")

    # ---- differential gates (shard-local on the kmer axis) ----
    # int32 totals: exact for genome-wide k-mer totals < 2^31 (beyond that
    # the host pipeline's int64 path is authoritative)
    tot = jnp.sum(counts_i, axis=1)
    in_window = (tot >= min_freq) & (tot <= max_freq)
    counts = counts_i.astype(jnp.float32)
    gcount = counts @ member.T  # (B_local, G)
    glen = member @ lengths
    gfreq = gcount / glen * jnp.float32(1e6)
    pad = set_groups < 0
    gathered = jnp.where(pad[None, :, :], -jnp.inf, gfreq[:, jnp.clip(set_groups, 0)])
    desc = -jnp.sort(-gathered, axis=-1)
    top = desc[..., 0]
    if baseline < 0:
        bidx = set_ncols + baseline
    else:
        bidx = jnp.full_like(set_ncols, baseline)
    bidx = jnp.clip(bidx, 0, set_groups.shape[1] - 1)
    base = jnp.take_along_axis(desc, bidx[None, :, None], axis=-1)[..., 0]
    include = (top / (base + jnp.float32(1e-20))) >= min_fold
    n_valid = jnp.sum(set_valid)
    votes = jnp.sum(include & set_valid[None, :], axis=1)
    fold_ok = (votes.astype(jnp.float32) / n_valid.astype(jnp.float32)) >= ratio
    diff = fold_ok & in_window & (cand_local != SENTINEL)

    # ---- feature-sharded clustering ----
    freqs = counts / lengths[None, :]  # (B_local, C)
    data = freqs.T  # (C, B_local)
    mean = jnp.mean(data, axis=0, keepdims=True)
    std = jnp.std(data, axis=0, keepdims=True)
    z = (data - mean) / jnp.where(std > 0, std, 1.0)
    z = jnp.where(diff[None, :], z, 0.0)  # masked features == dropped columns
    labels = _sh_kmeans(z, key, n_clusters)
    labels = _canonical_labels(labels, order, n_clusters)
    return labels, counts_i, diff


def build_phase_step(
    mesh: Mesh,
    *,
    k: int,
    n_pos_words: int,
    n_clusters: int,
    min_freq: float,
    max_freq: float,
    min_fold: float,
    ratio: float = 1.0,
    baseline: int = 1,
):
    """Returns a jitted sharded step fn(words, vwords, chrom_onehot,
    cand_codes, lengths, member, set_groups, set_ncols, set_valid, order, key)
    -> (labels (C,) replicated, counts (B, C) kmer-sharded, diff (B,)).
    """
    fn = functools.partial(
        _phase_step_local,
        k=k,
        n_pos_words=n_pos_words,
        n_clusters=n_clusters,
        min_freq=min_freq,
        max_freq=max_freq,
        min_fold=min_fold,
        ratio=ratio,
        baseline=baseline,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P("data", None),   # words
            P("data", None),   # vwords
            P("data", None),   # chrom_onehot
            P("kmer"),         # cand_codes
            P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P("kmer", None), P("kmer")),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_inputs(mesh: Mesh, words, vwords, chrom_onehot, cand_codes, *replicated):
    """Place host arrays with the step's shardings (pads to shard multiples)."""
    import numpy as np

    nd = mesh.shape["data"]
    nk = mesh.shape["kmer"]

    def pad_axis0(a, m, fill=0):
        r = (-a.shape[0]) % m
        if r:
            pad = np.full((r,) + a.shape[1:], fill, dtype=a.dtype)
            a = np.concatenate([a, pad])
        return a

    words = pad_axis0(np.asarray(words), nd)
    vwords = pad_axis0(np.asarray(vwords), nd)
    chrom_onehot = pad_axis0(np.asarray(chrom_onehot), nd)
    cand_codes = pad_axis0(np.asarray(cand_codes), nk, fill=SENTINEL)
    outs = [
        jax.device_put(words, NamedSharding(mesh, P("data", None))),
        jax.device_put(vwords, NamedSharding(mesh, P("data", None))),
        jax.device_put(chrom_onehot, NamedSharding(mesh, P("data", None))),
        jax.device_put(cand_codes, NamedSharding(mesh, P("kmer"))),
    ]
    for r in replicated:
        outs.append(jax.device_put(r, NamedSharding(mesh, P())))
    return outs
