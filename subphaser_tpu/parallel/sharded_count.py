"""Sharded k-mer spectrum discovery: tiles data-parallel, k-mer space
exchanged with all_to_all.

The reference merges per-process counts through the filesystem (dump files
read into one dict, reference Jellyfish.py:446-458, or GNU sort -m,
:814-824). Device-native equivalent over a 1-D "data" mesh:

1. every device sorts + RLE-encodes the canonical codes of its tile shard;
2. the code space [0, 4^k) is split into D equal ranges, device d owning
   range d; each device slices its sorted local spectrum at the range
   boundaries (searchsorted) into D equal-quota send buffers;
3. one ``all_to_all`` puts every code at its owner;
4. each owner merges its received runs (sort + segmented sum) into the
   device-owned disjoint spectrum shard.

Quotas are static (all_to_all needs equal splits): each send slot holds
``local_size // D + slack``; overflow is detected on device and reported so
the caller can retry with more slack (uniform hashing of canonical codes
makes overflow improbable at 2x slack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from subphaser_tpu.ops.count import sort_rle
from subphaser_tpu.ops.kmer import SENTINEL, kmer_codes


def _local_count_and_exchange(words, vwords, *, k, n_pos_words, quota, n_dev):
    """Runs per device under shard_map; returns (codes, counts, overflow)."""
    def one(wv):
        w, v = wv
        return kmer_codes(w, v, k, n_pos_words).reshape(-1)

    codes = jax.lax.map(one, (words, vwords)).reshape(-1)
    ucodes, ucounts = sort_rle(codes)
    n = ucodes.shape[0]

    # range owner boundaries over code space [0, 4^k): static python ints
    # (int64 math would truncate under the default x64-disabled mode)
    space = jnp.int32(1 << (2 * k))
    bounds = jnp.asarray(
        np.array([(i * (1 << (2 * k))) // n_dev for i in range(1, n_dev)], np.int32)
    )
    cut = jnp.searchsorted(ucodes, bounds)  # (D-1,)
    starts = jnp.concatenate([jnp.zeros(1, cut.dtype), cut])
    # number of REAL entries (not SENTINEL padding)
    n_real = jnp.searchsorted(ucodes, space - 1, side="right")
    ends = jnp.concatenate([cut, n_real[None]])
    sizes = ends - starts
    overflow = jnp.any(sizes > quota)

    # gather each range into its fixed-quota slot
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_dev, quota), 1)
    src = starts[:, None] + slot
    valid = slot < sizes[:, None]
    src_c = jnp.minimum(src, n - 1)
    send_codes = jnp.where(valid, ucodes[src_c], SENTINEL)
    send_counts = jnp.where(valid, ucounts[src_c], 0)

    recv_codes = jax.lax.all_to_all(send_codes, "data", 0, 0, tiled=False)
    recv_counts = jax.lax.all_to_all(send_counts, "data", 0, 0, tiled=False)
    # received: (D, quota) runs from every peer for MY code range -> merge
    # (scan RLE + sort-based compaction; see ops/count for why
    # where(size=)+gathers are banned)
    from subphaser_tpu.ops.count import _compact_survivors, _merge_sorted_runs

    flat_codes = recv_codes.reshape(-1)
    flat_counts = recv_counts.reshape(-1)
    s, run_tot, keep, _m = _merge_sorted_runs(flat_codes, flat_counts, 1)
    out_codes, out_counts = _compact_survivors(
        s, keep, run_tot, int(flat_codes.shape[0])
    )
    return out_codes, out_counts, overflow


def build_sharded_count(mesh: Mesh, *, k: int, n_pos_words: int, tiles_per_dev: int,
                        slack: float = 2.0):
    """Jitted fn(words (T, W), vwords) -> (codes, counts, overflow) where the
    spectrum is sharded over the mesh's "data" axis by code range."""
    n_dev = mesh.shape["data"]
    local = tiles_per_dev * 16 * n_pos_words
    quota = int(local // n_dev * slack) + 16

    fn = functools.partial(
        _local_count_and_exchange,
        k=k, n_pos_words=n_pos_words, quota=quota, n_dev=n_dev,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None)),
        out_specs=(P("data"), P("data"), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_spectrum(
    mesh: Mesh, tiles, k: int, n_pos_words: int
) -> tuple[np.ndarray, np.ndarray]:
    """Count one chromosome's tiles across the mesh -> host (codes, counts).

    ``tiles``: list of Tile objects. Pads the tile list to a multiple of the
    mesh size with empty tiles. On (improbable) range-quota overflow the
    exchange retries with doubled slack.
    """
    n_dev = mesh.shape["data"]
    words = np.stack([t.words for t in tiles])
    vwords = np.stack([t.vwords for t in tiles])
    pad = (-len(tiles)) % n_dev
    if pad:
        words = np.concatenate([words, np.zeros((pad,) + words.shape[1:], words.dtype)])
        vwords = np.concatenate(
            [vwords, np.zeros((pad,) + vwords.shape[1:], vwords.dtype)]
        )
    tiles_per_dev = words.shape[0] // n_dev
    words_d = jax.device_put(words, NamedSharding(mesh, P("data", None)))
    vwords_d = jax.device_put(vwords, NamedSharding(mesh, P("data", None)))
    slack = 2.0
    while True:
        step = build_sharded_count(
            mesh, k=k, n_pos_words=n_pos_words, tiles_per_dev=tiles_per_dev,
            slack=slack,
        )
        codes, counts, overflow = step(words_d, vwords_d)
        if not bool(overflow):
            break
        if slack >= float(n_dev):  # quota == full local spectrum: cannot overflow
            raise RuntimeError("sharded_spectrum overflow at maximum slack")
        slack = min(slack * 2.0, float(n_dev))
    codes = np.asarray(codes)
    counts = np.asarray(counts)
    m = codes != SENTINEL
    codes, counts = codes[m], counts[m]
    order = np.argsort(codes, kind="stable")
    return codes[order], counts[order].astype(np.int64)
