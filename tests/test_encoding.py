import numpy as np
import pytest

from subphaser_tpu.io.encoding import (
    canonical_code,
    code_to_kmer,
    codes_to_kmers,
    encode_bases,
    kmer_code,
    pack_words,
    revcomp_code,
    revcomp_str,
    unpack_words,
)
from tests.oracle import canonical, revcomp


def random_seq(rng, n, n_frac=0.0):
    bases = rng.choice(list("ACGT"), size=n)
    if n_frac:
        mask = rng.random(n) < n_frac
        bases[mask] = "N"
    return "".join(bases)


def test_encode_roundtrip():
    rng = np.random.default_rng(0)
    seq = random_seq(rng, 1000, n_frac=0.05)
    seq_bytes = np.frombuffer(seq.encode(), dtype=np.uint8)
    codes, valid = encode_bases(seq_bytes)
    packed, vmask = pack_words(codes, valid)
    codes2, valid2 = unpack_words(packed, vmask, len(seq))
    np.testing.assert_array_equal(codes, codes2)
    np.testing.assert_array_equal(valid, valid2)
    for i, ch in enumerate(seq):
        if ch == "N":
            assert valid[i] == 0
        else:
            assert valid[i] == 1
            assert "ACGT"[codes[i]] == ch


def test_lowercase_valid():
    codes, valid = encode_bases(np.frombuffer(b"acgtN", dtype=np.uint8))
    np.testing.assert_array_equal(codes[:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(valid, [1, 1, 1, 1, 0])


@pytest.mark.parametrize("k", [1, 3, 7, 15, 21, 31])
def test_kmer_code_revcomp(k):
    rng = np.random.default_rng(k)
    for _ in range(50):
        s = random_seq(rng, k)
        code = kmer_code(s)
        assert code_to_kmer(code, k) == s
        assert code_to_kmer(revcomp_code(code, k), k) == revcomp(s)
        assert code_to_kmer(canonical_code(code, k), k) == canonical(s)


def test_codes_to_kmers_vectorized():
    rng = np.random.default_rng(1)
    seqs = [random_seq(rng, 15) for _ in range(100)]
    codes = np.array([kmer_code(s) for s in seqs])
    np.testing.assert_array_equal(codes_to_kmers(codes, 15), np.array(seqs))


def test_revcomp_str():
    assert revcomp_str("ACGTN") == "NACGT"
