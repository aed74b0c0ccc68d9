"""Unit tests for the progressive MSA stack (ltr/msa + native
sp_profile_align) — the reference's mafft/trimal/FastTree replacement
(reference LTR.py:144-299)."""

import numpy as np
import pytest

from subphaser_tpu.ltr.msa import (
    AA,
    GAP,
    blosum62_21,
    encode_peptides,
    kimura_distances,
    nj_with_support,
    progressive_msa,
    trim_alignment,
    write_fasta_alignment,
)
from subphaser_tpu.ltr.native import profile_align


def _onehot_profile(seq: np.ndarray) -> np.ndarray:
    prof = np.zeros((seq.size, 21), dtype=np.float32)
    prof[np.arange(seq.size), seq] = 1.0
    return prof


def test_profile_align_identity():
    """Identical sequences align with zero gaps."""
    s = encode_peptides(["ACDEFGHIKLMNPQRST"])[0]
    p = _onehot_profile(s)
    ops = profile_align(p, p @ blosum62_21().T)
    assert ops.shape[0] == 1
    assert ops[0, 0] == 0 and ops[0, 1] == s.size


def test_profile_align_single_deletion():
    """A 3-residue deletion comes out as one gap run at the right place."""
    a = encode_peptides(["ACDEFGHIKLMNPQRSTVWY" * 2])[0]
    b = np.concatenate([a[:10], a[13:]])
    S = blosum62_21()
    ops = profile_align(_onehot_profile(a), _onehot_profile(b) @ S.T)
    kinds = ops[:, 0].tolist()
    assert kinds.count(1) == 1  # one profile-1-only run
    gap_run = ops[ops[:, 0] == 1][0]
    assert gap_run[1] == 3
    # aligned columns total the shorter length
    assert ops[ops[:, 0] == 0][:, 1].sum() == b.size


def test_progressive_msa_rows_in_input_order():
    base = "ACDEFGHIKLMNPQRSTVWY" * 3
    peps = [base, base[:30] + base[33:], base]
    aln = progressive_msa(peps)
    assert aln.shape[0] == 3
    # rows 0 and 2 are identical sequences -> identical rows
    assert np.array_equal(aln[0], aln[2])
    # row 1 carries exactly 3 gap columns
    assert int((aln[1] == GAP).sum()) == 3


def test_trim_alignment_drops_gap_columns():
    aln = np.full((10, 6), GAP, dtype=np.uint8)
    aln[:, :3] = 1  # 3 fully-populated columns
    aln[0, 3] = 2   # column 3: 10% residues -> kept at threshold 0.1
    trimmed, kept = trim_alignment(aln, min_residue_frac=0.1)
    assert kept.tolist() == [0, 1, 2, 3]
    assert trimmed.shape == (10, 4)


def test_kimura_distance_values():
    """p=0 -> d=0; known p gives the Kimura closed form."""
    a = encode_peptides(["ACDEFGHIKL"])[0]
    b = a.copy()
    b[0] = (b[0] + 1) % 20  # one mismatch of 10 -> p = 0.1
    aln = np.stack([a, b])
    d = kimura_distances(aln)
    assert d[0, 0] == 0.0
    p = 0.1
    expect = -np.log(1 - p - 0.2 * p * p)
    assert d[0, 1] == pytest.approx(expect, rel=1e-5)


def test_bootstrap_support_high_for_clean_split():
    """Two well-separated clades get ~100% support."""
    rng = np.random.default_rng(3)
    base_a = "".join(rng.choice(list(AA), 80))
    base_b = "".join(rng.choice(list(AA), 80))

    def mut(s, n):
        s = list(s)
        for p in rng.choice(len(s), n, replace=False):
            s[p] = AA[rng.integers(0, 20)]
        return "".join(s)

    peps = [mut(base_a, 2), mut(base_a, 2), mut(base_b, 2), mut(base_b, 2)]
    aln = progressive_msa(peps)
    nwk = nj_with_support(aln, ["a1", "a2", "b1", "b2"], n_boot=40, seed=1)
    import re

    sup = [int(x) for x in re.findall(r"\)(\d+):", nwk)]
    assert sup and max(sup) >= 90, nwk


def test_write_fasta_alignment(tmp_path):
    aln = np.array([[0, 1, GAP], [0, GAP, 2]], dtype=np.uint8)
    path = str(tmp_path / "x.aln")
    write_fasta_alignment(path, ["s1", "s2"], aln)
    text = open(path).read()
    assert ">s1\nAC-\n>s2\nA-D\n" == text
