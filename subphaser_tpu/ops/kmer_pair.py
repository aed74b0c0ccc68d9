"""Canonical k-mer codes for k in [16, 31]: (hi, lo) int32 pair representation.

JAX runs with x64 disabled, so 2k-bit codes (up to 62 bits) are carried as
two int32 words on device: ``lo`` = bits [0, 31), ``hi`` = bits [31, 2k).
Hosts combine them into true int64 (``hi << 31 | lo``), so everything
host-side (merges, matrices, matching, k-mer strings) reuses the int64 path.

Same word-level scheme as ops/kmer.py: the k-mer window at position p spans
three packed words; the little-endian window value gives the reverse
complement by complement alone and the forward code by one 2-bit-group
reversal (see ops/kmer.py docstring for the identity).

k = 31 and the SENTINEL: at k = 31 the hi part holds 31 value bits, so
hi == SENTINEL (= 2^31 - 1) is representable. For CANONICAL codes it can
never occur: hi all-ones requires the first 15 bases T and base 16 in
{G, T}; canonicity (code <= rc) then forces rc to open with the same T-run,
which pins the last 15 bases to A and position 16 of rc to the COMPLEMENT
of base 16 — complement(G/T) = C/A < G/T, contradiction. Counting's
hi-only pad tests therefore stay exact at k = 31. FORWARD codes (mapping)
can reach hi == SENTINEL legitimately, so the pair-code mapping path tests
the (hi, lo) PAIR against (SENTINEL, SENTINEL); only a position whose
forward 31-mer is exactly T^31 is then indistinguishable from padding and
is skipped (documented deviation — poly-T 31-mers are never
subgenome-specific).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.ops.kmer import BASES_PER_WORD, SENTINEL, _reverse2bits32


def _codes_pair(words, vwords, k: int, n_pos_words: int, canonical: bool):
    if not 16 <= k <= 31:
        raise ValueError("pair codes support k in [16, 31]")
    w = words.astype(jnp.uint32)
    v = vwords.astype(jnp.uint32)
    w0 = w[:n_pos_words]
    w1 = w[1 : n_pos_words + 1]
    w2 = w[2 : n_pos_words + 2]
    v0 = v[:n_pos_words]
    v1 = v[1 : n_pos_words + 1]
    v2 = v[2 : n_pos_words + 2]

    bits = 2 * k
    hi_bits = bits - 31
    mask_hi_win = jnp.uint32((1 << (bits - 32)) - 1)  # window hi mask (bits-32 used)
    vmask_k = (1 << k) - 1
    shift_rev = 64 - bits  # in [4, 32]

    out_hi, out_lo = [], []
    for p in range(BASES_PER_WORD):
        if p == 0:
            vlo = w0
            vhi = w1
        else:
            vlo = (w0 >> jnp.uint32(2 * p)) | (w1 << jnp.uint32(32 - 2 * p))
            vhi = (w1 >> jnp.uint32(2 * p)) | (w2 << jnp.uint32(32 - 2 * p))
        # little-endian window = vhi:vlo (64 bits); k-mer = bits [0, 2k)

        # reverse complement, big-endian == complement of the window
        rc_lo32 = ~vlo
        rc_hi32 = (~vhi) & mask_hi_win

        # forward big-endian = reverse 2-bit groups of the 2k window bits:
        # reverse the full 64 (swap halves + rev32 each) then >> (64-2k)
        r_hi = _reverse2bits32(vlo)  # high half of reversed 64
        r_lo = _reverse2bits32(vhi)  # low half
        s = shift_rev
        if s == 32:
            f_lo32 = r_hi
            f_hi32 = jnp.zeros_like(r_hi)
        else:
            f_lo32 = (r_lo >> jnp.uint32(s)) | (r_hi << jnp.uint32(32 - s))
            f_hi32 = (r_hi >> jnp.uint32(s)) & mask_hi_win

        # 32/32 split -> 31/31 code split: lo = bits [0,31), hi = bits [31,2k)
        def resplit(lo32, hi32):
            lo31 = lo32 & jnp.uint32(0x7FFFFFFF)
            hi31 = ((lo32 >> jnp.uint32(31)) | (hi32 << jnp.uint32(1))) & jnp.uint32(
                (1 << hi_bits) - 1
            )
            return hi31, lo31

        f_hi, f_lo = resplit(f_lo32, f_hi32)
        if canonical:
            r_hi31, r_lo31 = resplit(rc_lo32, rc_hi32)
            sel = (f_hi < r_hi31) | ((f_hi == r_hi31) & (f_lo < r_lo31))
            c_hi = jnp.where(sel, f_hi, r_hi31)
            c_lo = jnp.where(sel, f_lo, r_lo31)
        else:
            c_hi, c_lo = f_hi, f_lo

        # validity: k bits from v0/v1/v2 starting at p
        if p == 0:
            vv = (v0 | (v1 << jnp.uint32(16))) & jnp.uint32(vmask_k)
        else:
            vv = (
                (v0 >> jnp.uint32(p))
                | (v1 << jnp.uint32(16 - p))
                | (v2 << jnp.uint32(32 - p))
            ) & jnp.uint32(vmask_k)
        ok = vv == vmask_k
        out_hi.append(jnp.where(ok, c_hi.astype(jnp.int32), SENTINEL))
        out_lo.append(jnp.where(ok, c_lo.astype(jnp.int32), SENTINEL))
    return jnp.stack(out_hi), jnp.stack(out_lo)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def kmer_codes_pair(words, vwords, k: int, n_pos_words: int):
    """Canonical (hi, lo) codes, each (16, n_pos_words) int32."""
    return _codes_pair(words, vwords, k, n_pos_words, canonical=True)


@functools.partial(jax.jit, static_argnames=("k", "n_pos_words"))
def forward_codes_pair(words, vwords, k: int, n_pos_words: int):
    return _codes_pair(words, vwords, k, n_pos_words, canonical=False)


# ---------------------------------------------------------------------------
# host combine/split
# ---------------------------------------------------------------------------
def combine64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    return (np.asarray(hi, dtype=np.int64) << 31) | np.asarray(lo, dtype=np.int64)


def split64(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code, dtype=np.int64)
    return (code >> 31).astype(np.int32), (code & 0x7FFFFFFF).astype(np.int32)
