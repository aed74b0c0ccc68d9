"""2-bit DNA encoding shared by host (numpy) and device (jnp) code.

Encoding: A=0, C=1, G=2, T=3 (lexicographic, so numeric order == lexicographic
order of the k-mer string). Complement is ``base ^ 3``; the canonical form of a
k-mer code is ``min(code, revcomp(code))``, which matches jellyfish
``--canonical`` semantics (the reference invokes jellyfish with --canonical at
Jellyfish.py:697-703).

Packed layout: 16 bases per int32 word, base ``i`` of a word occupying bits
``[2*i, 2*i+2)`` (little-endian within the word). A parallel validity word
holds bit ``i`` = 1 iff base ``i`` is an unambiguous A/C/G/T (uppercase or
lowercase); anything else (N, IUPAC codes, gaps) is invalid and excluded from
k-mer counting exactly like jellyfish skips N-containing k-mers.
"""

from __future__ import annotations

import numpy as np

BASES_PER_WORD = 16
BITS_PER_BASE = 2

# byte -> 2-bit code (invalid bases map to 0 with valid=0)
_CODE_LUT = np.zeros(256, dtype=np.uint8)
_VALID_LUT = np.zeros(256, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _CODE_LUT[_b] = _i
    _CODE_LUT[_b + 32] = _i  # lowercase
    _VALID_LUT[_b] = 1
    _VALID_LUT[_b + 32] = 1

_BASE_CHARS = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_bases(seq_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ASCII uint8 array -> (codes uint8 in 0..3, valid uint8 in 0/1)."""
    seq_bytes = np.asarray(seq_bytes, dtype=np.uint8)
    return _CODE_LUT[seq_bytes], _VALID_LUT[seq_bytes]


def pack_words(codes: np.ndarray, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack per-base codes/validity into int32 words (16 bases per word).

    Length is padded up to a multiple of 16 with invalid bases.
    Returns (packed int32[ceil(n/16)], validmask int32[ceil(n/16)]).
    """
    n = codes.shape[0]
    n_words = -(-n // BASES_PER_WORD)
    pad = n_words * BASES_PER_WORD - n
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
        valid = np.concatenate([valid, np.zeros(pad, dtype=np.uint8)])
    codes = codes.astype(np.uint32).reshape(n_words, BASES_PER_WORD)
    valid = valid.astype(np.uint32).reshape(n_words, BASES_PER_WORD)
    shifts2 = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 2)[None, :]
    shifts1 = np.arange(BASES_PER_WORD, dtype=np.uint32)[None, :]
    packed = (codes << shifts2).sum(axis=1, dtype=np.uint32)
    vmask = (valid << shifts1).sum(axis=1, dtype=np.uint32)
    return packed.astype(np.int32), vmask.astype(np.int32)


def unpack_words(packed: np.ndarray, vmask: np.ndarray, n: int | None = None):
    """Inverse of :func:`pack_words` (host-side, for tests/oracles)."""
    packed = packed.astype(np.uint32)
    vmask = vmask.astype(np.uint32)
    shifts2 = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 2)[None, :]
    shifts1 = np.arange(BASES_PER_WORD, dtype=np.uint32)[None, :]
    codes = ((packed[:, None] >> shifts2) & 3).astype(np.uint8).reshape(-1)
    valid = ((vmask[:, None] >> shifts1) & 1).astype(np.uint8).reshape(-1)
    if n is not None:
        codes, valid = codes[:n], valid[:n]
    return codes, valid


def kmer_code(seq: str) -> int:
    """k-mer string -> integer code (big-endian: first base = high bits)."""
    code = 0
    for ch in seq.upper():
        code = (code << 2) | int(_CODE_LUT[ord(ch)])
    return code


def code_to_kmer(code: int, k: int) -> str:
    out = []
    for i in range(k):
        out.append("ACGT"[(code >> (2 * (k - 1 - i))) & 3])
    return "".join(out)


def codes_to_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """Vectorized int codes -> array of k-mer strings (dtype '<U{k}')."""
    codes = np.asarray(codes, dtype=np.int64)
    shifts = (2 * (k - 1 - np.arange(k, dtype=np.int64)))[None, :]
    idx = ((codes[:, None] >> shifts) & 3).astype(np.uint8)
    chars = _BASE_CHARS[idx]  # (n, k) ASCII
    return chars.view(f"S{k}").reshape(-1).astype(f"U{k}")


def revcomp_code(code, k: int):
    """Reverse-complement of k-mer integer code(s); numpy-vectorized.

    Works on python ints or numpy arrays (int64 math to stay exact for k<=31).
    """
    code = np.asarray(code, dtype=np.uint64)
    x = ~code  # complement every base (base ^ 3)
    # reverse 2-bit groups within a 64-bit word
    x = ((x & np.uint64(0x3333333333333333)) << np.uint64(2)) | (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = ((x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4)) | (
        (x >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
    )
    x = ((x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8)) | (
        (x >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)
    )
    x = ((x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16)) | (
        (x >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)
    )
    x = (x << np.uint64(32)) | (x >> np.uint64(32))
    x >>= np.uint64(64 - 2 * k)
    out = x.astype(np.int64)
    if out.ndim == 0:
        return int(out)
    return out


def canonical_code(code, k: int):
    rc = revcomp_code(code, k)
    return np.minimum(np.asarray(code, dtype=np.int64), rc)


def revcomp_str(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp.get(c, "N") for c in reversed(seq.upper()))
