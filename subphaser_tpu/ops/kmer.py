"""Canonical k-mer code extraction on device (pure-jnp formulation).

Replaces jellyfish's streaming hash counting (reference Jellyfish.py:697-703)
with a vectorized word-level scheme designed for the TPU VPU:

For packed word ``w[i]`` (16 bases, base j at bits ``[2j, 2j+2)``) and its
successor ``w[i+1]``, the k-mer starting at base position ``p`` of word ``i``
occupies bits ``[2p, 2p+2k)`` of the 64-bit concatenation — extracted with two
32-bit shifts. The extracted value ``val`` holds the k-mer bases in
*little-endian* order, which gives both strands almost for free:

- forward code (big-endian, lexicographic)  = reverse2bits(val)
- reverse-complement code                    = ~val & mask  (one XOR!)
- canonical (jellyfish --canonical parity)   = min(forward, rc)

Everything is an elementwise op over vectors of words, statically unrolled
over the 16 in-word offsets, so XLA fuses the whole pipeline into one pass.
Output is in (offset-major, word) order — irrelevant for counting, which
sorts anyway, and recoverable analytically for bin mapping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BASES_PER_WORD = 16
SENTINEL = np.int32(np.iinfo(np.int32).max)  # sorts after every valid code


def _reverse2bits32(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the sixteen 2-bit groups of a uint32 vector."""
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    return x


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def kmer_codes(words: jnp.ndarray, vwords: jnp.ndarray, k: int, n_pos_words: int):
    """Canonical k-mer codes for every start position in a packed tile.

    Args:
      words:  int32 (n_words,) packed bases (n_words = n_pos_words + halo)
      vwords: int32 (n_words,) validity bits (16 per word)
      k:      k-mer length, 1 <= k <= 15 (codes fit signed int32)
      n_pos_words: number of words whose 16 start positions are produced

    Returns:
      codes int32 (16, n_pos_words): canonical code of the k-mer starting at
      base ``w*16 + p`` in element ``[p, w]``; SENTINEL where the k-mer
      contains an invalid base or runs past the tile.
    """
    if not 1 <= k <= 15:
        raise ValueError("kmer_codes supports k in [1, 15] for int32 codes")
    w = words.astype(jnp.uint32)
    v = vwords.astype(jnp.uint32)
    w0 = w[:n_pos_words]
    w1 = w[1 : n_pos_words + 1]
    v0 = v[:n_pos_words]
    v1 = v[1 : n_pos_words + 1]

    mask = jnp.uint32((1 << (2 * k)) - 1)
    vmask = jnp.uint32((1 << k) - 1)
    shift_rev = 32 - 2 * k

    outs = []
    for p in range(BASES_PER_WORD):
        val = w0 >> jnp.uint32(2 * p)
        if 2 * p + 2 * k > 32:
            val = val | (w1 << jnp.uint32(32 - 2 * p))
        val = val & mask
        fwd = _reverse2bits32(val) >> jnp.uint32(shift_rev)
        rc = (~val) & mask
        canon = jnp.minimum(fwd, rc).astype(jnp.int32)
        vv = ((v0 >> jnp.uint32(p)) | (v1 << jnp.uint32(16 - p))) & vmask
        ok = vv == vmask
        outs.append(jnp.where(ok, canon, SENTINEL))
    return jnp.stack(outs, axis=0)


def position_of(p: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(offset p, word w) -> base position within the tile."""
    return w * BASES_PER_WORD + p


# ---------------------------------------------------------------------------
# Forward-strand codes (for mapping SG-specific k-mers back onto the genome).
# The reference maps by exact forward-substring lookup against a dict that
# contains each significant k-mer AND its reverse complement
# (reference Cluster.py:174-175, Seqs.py:217-219), so mapping needs the
# forward (non-canonical) code at every position.
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def forward_codes(words: jnp.ndarray, vwords: jnp.ndarray, k: int, n_pos_words: int):
    """Forward-strand k-mer codes, same layout/masking as :func:`kmer_codes`."""
    if not 1 <= k <= 15:
        raise ValueError("forward_codes supports k in [1, 15] for int32 codes")
    w = words.astype(jnp.uint32)
    v = vwords.astype(jnp.uint32)
    w0 = w[:n_pos_words]
    w1 = w[1 : n_pos_words + 1]
    v0 = v[:n_pos_words]
    v1 = v[1 : n_pos_words + 1]

    mask = jnp.uint32((1 << (2 * k)) - 1)
    vmask = jnp.uint32((1 << k) - 1)
    shift_rev = 32 - 2 * k

    outs = []
    for p in range(BASES_PER_WORD):
        val = w0 >> jnp.uint32(2 * p)
        if 2 * p + 2 * k > 32:
            val = val | (w1 << jnp.uint32(32 - 2 * p))
        val = val & mask
        fwd = (_reverse2bits32(val) >> jnp.uint32(shift_rev)).astype(jnp.int32)
        vv = ((v0 >> jnp.uint32(p)) | (v1 << jnp.uint32(16 - p))) & vmask
        ok = vv == vmask
        outs.append(jnp.where(ok, fwd, SENTINEL))
    return jnp.stack(outs, axis=0)
