"""Input robustness: messy FASTA, IUPAC codes, duplicate ids, edge configs."""

import gzip

import numpy as np
import pytest

from subphaser_tpu.io.fasta import iter_fasta, write_fasta
from subphaser_tpu.io.genome import PackedGenome


def test_crlf_and_blank_lines(tmp_path):
    p = tmp_path / "a.fa"
    p.write_bytes(b">c1 description here\r\nACGT\r\n\r\nacgt\r\n>c2\r\nNNNN\r\n")
    recs = list(iter_fasta(str(p)))
    assert recs[0][0] == "c1"
    assert recs[0][1] == "description here"
    assert recs[0][2].tobytes() == b"ACGTacgt"
    assert recs[1][2].tobytes() == b"NNNN"


def test_iupac_codes_invalid(tmp_path):
    g = PackedGenome.from_dict({"c": "ACGTRYSWKMBDHVN"})
    from subphaser_tpu.io.encoding import unpack_words

    codes, valid = unpack_words(g.chroms[0].packed, g.chroms[0].vmask, 15)
    assert valid[:4].tolist() == [1, 1, 1, 1]
    assert valid[4:].sum() == 0  # every IUPAC ambiguity code is invalid


def test_gz_and_plain_equivalent(tmp_path):
    seq = "ACGT" * 100
    write_fasta(str(tmp_path / "a.fa"), [("c", seq)])
    write_fasta(str(tmp_path / "a.fa.gz"), [("c", seq)])
    r1 = list(iter_fasta(str(tmp_path / "a.fa")))
    r2 = list(iter_fasta(str(tmp_path / "a.fa.gz")))
    assert r1[0][2].tobytes() == r2[0][2].tobytes()
    # gz magic detection also works for a .gz-named plain file
    (tmp_path / "b.fa.gz").write_text(">c\nACGT\n")
    r3 = list(iter_fasta(str(tmp_path / "b.fa.gz")))
    assert r3[0][2].tobytes() == b"ACGT"


def test_duplicate_genome_files_rejected():
    from subphaser_tpu.phase.pipeline import Pipeline

    with pytest.raises(ValueError, match="Duplicates"):
        Pipeline(["g.fa", "g.fa"], ["c.cfg"])


def test_config_rows_wider_than_nsg(tmp_path):
    # a 3-column row after 2-column rows: nsg = max width
    cfg = tmp_path / "c.cfg"
    cfg.write_text("a1\tb1\na2\tb2\tc2\n")
    from subphaser_tpu.config import SGConfig

    c = SGConfig.parse(str(cfg))
    assert c.nsg == 3


def test_window_larger_than_chromosome():
    from subphaser_tpu.phase.enrich import stack_windows

    per_chrom = [np.array([[3, 1], [0, 2]], dtype=np.int64)]  # 2 bins of 10
    rn, counts = stack_windows(per_chrom, ["tiny"], bin_size=10, window_size=1000)
    assert rn == [("tiny", 0, 1000)]
    np.testing.assert_array_equal(counts, [[3, 3]])


def test_feature_pack_empty_and_short():
    from subphaser_tpu.phase.cluster import SigKmers
    from subphaser_tpu.phase.features import FeaturePack

    sig = SigKmers(
        codes=np.array([5], dtype=np.int32), sg=np.zeros(1, np.int32),
        canon_codes=np.zeros(0, np.int32), canon_sg=np.zeros(0, np.int32),
        sg_names=["SG1"],
    )
    pack = FeaturePack.build([("short", "ACG"), ("ok", "ACGT" * 50)], 15)
    counts = pack.map_counts(sig, 15, tile_bases=1 << 10)
    assert counts.shape == (2, 1)


def test_kmer_too_large_rejected(tmp_path):
    from subphaser_tpu.phase.pipeline import Pipeline

    # k=31 became supported in round 4; the hard cap is now 32
    write_fasta(str(tmp_path / "g.fa"), [("c1", "ACGT" * 100)])
    (tmp_path / "c.cfg").write_text("c1\tc1\n")
    pipe = Pipeline([str(tmp_path / "g.fa")], [str(tmp_path / "c.cfg")],
                    k=32, outdir=str(tmp_path / "o"), tmpdir=str(tmp_path / "t"))
    with pytest.raises(ValueError, match="k=32 unsupported"):
        pipe.run()
