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


@pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 4093, 65536])
def test_native_pack_body_matches_numpy(n):
    """ltr/native.pack_body (single C pass over the raw body, newlines
    embedded) must produce bit-identical words to encode_bases+pack_words."""
    pytest.importorskip("subphaser_tpu.ltr.native")
    from subphaser_tpu.ltr.native import pack_body

    rng = np.random.default_rng(n)
    seq = random_seq(rng, n, n_frac=0.03)
    # mixed case + IUPAC ambiguity to exercise the validity LUT
    seq = "".join(
        c.lower() if rng.random() < 0.3 else ("Y" if rng.random() < 0.01 else c)
        for c in seq
    )
    # re-wrap at 60 cols with a stray CRLF to mimic on-disk FASTA bodies
    lines = [seq[i : i + 60] for i in range(0, len(seq), 60)]
    raw_bytes = b"\r\n".join(ln.encode() for ln in lines[:2]) + (
        b"\n" + "\n".join(lines[2:]).encode() if len(lines) > 2 else b""
    )
    raw = np.frombuffer(raw_bytes + b"\n", dtype=np.uint8)

    packed_n, vmask_n, nb = pack_body(raw)
    assert nb == len(seq)
    codes, valid = encode_bases(np.frombuffer(seq.encode(), dtype=np.uint8))
    packed_ref, vmask_ref = pack_words(codes, valid)
    np.testing.assert_array_equal(packed_n, packed_ref)
    np.testing.assert_array_equal(vmask_n, vmask_ref)


def test_iter_fasta_raw_matches_iter_fasta(tmp_path):
    from subphaser_tpu.io.fasta import iter_fasta, iter_fasta_raw

    rng = np.random.default_rng(7)
    recs = {f"chr{i}": random_seq(rng, int(rng.integers(10, 500))) for i in range(4)}
    path = tmp_path / "g.fa"
    with open(path, "w") as f:
        for name, seq in recs.items():
            f.write(f">{name} some desc {name}\n")
            for j in range(0, len(seq), 37):
                f.write(seq[j : j + 37] + "\n")
    clean = list(iter_fasta(str(path)))
    raw = list(iter_fasta_raw(str(path)))
    assert [r[0] for r in raw] == [c[0] for c in clean] == list(recs)
    assert [r[1] for r in raw] == [c[1] for c in clean]
    for (_, _, rbody), (_, _, cbody) in zip(raw, clean):
        stripped = rbody.tobytes().replace(b"\n", b"").replace(b"\r", b"")
        assert stripped == cbody.tobytes()


def test_from_raw_body_roundtrip():
    from subphaser_tpu.io.genome import PackedChromosome

    rng = np.random.default_rng(11)
    seq = random_seq(rng, 1234, n_frac=0.02)
    wrapped = "\n".join(seq[i : i + 50] for i in range(0, len(seq), 50)) + "\n"
    c = PackedChromosome.from_raw_body(
        "c1", np.frombuffer(wrapped.encode(), dtype=np.uint8)
    )
    assert c.length == len(seq)
    assert c.to_seq() == seq


def test_native_pack_body_arbitrary_bytes():
    """pack_body must match the numpy path on ARBITRARY byte soup (headers
    never reach it, but robustness against IUPAC/garbage bytes matters)."""
    pytest.importorskip("subphaser_tpu.ltr.native")
    from subphaser_tpu.ltr.native import pack_body

    rng = np.random.default_rng(99)
    for trial in range(6):
        raw = rng.integers(0, 256, int(rng.integers(1, 5000)), dtype=np.uint8)
        stripped = bytes(raw).replace(b"\n", b"").replace(b"\r", b"")
        packed_n, vmask_n, nb = pack_body(raw)
        codes, valid = encode_bases(np.frombuffer(stripped, dtype=np.uint8))
        packed_ref, vmask_ref = pack_words(codes, valid)
        assert nb == len(stripped)
        np.testing.assert_array_equal(packed_n, packed_ref, err_msg=f"t{trial}")
        np.testing.assert_array_equal(vmask_n, vmask_ref, err_msg=f"t{trial}")
