import io

import numpy as np

from subphaser_tpu.phase.enrich import (
    enrich_bin,
    enrich_features,
    enrich_rows,
    group_exchanges,
    is_exchange,
    stack_windows,
    write_bin_counts,
)


def test_stack_windows():
    per_chrom = [np.zeros((25, 2), dtype=np.int64)]
    per_chrom[0][0] = [5, 1]
    per_chrom[0][9] = [2, 0]
    per_chrom[0][10] = [0, 3]
    per_chrom[0][24] = [1, 1]
    rn, counts = stack_windows(per_chrom, ["c1"], bin_size=10, window_size=100)
    assert rn == [("c1", 0, 100), ("c1", 100, 200), ("c1", 200, 300)]
    np.testing.assert_array_equal(counts, [[7, 1], [0, 3], [1, 1]])


def test_enrich_rows_gates():
    counts = np.array([
        [500, 2],    # strongly SG1
        [2, 500],    # strongly SG2
        [250, 250],  # balanced: not significant
    ])
    rows = enrich_rows(counts, ["SG1", "SG2"], [("c", 0, 10), ("c", 10, 20), ("c", 20, 30)])
    assert rows[0].sig and rows[0].key == "SG1"
    assert rows[1].sig and rows[1].key == "SG2"
    assert not rows[2].sig and rows[2].key is None
    np.testing.assert_array_equal(rows[0].enrich, [1, 0, 0])
    np.testing.assert_array_equal(rows[2].enrich, [0, 0, 1])


def test_is_exchange():
    assert is_exchange("SG1", "SG1") == "no"
    assert is_exchange("SG1", "SG2") == "yes"
    assert is_exchange(None, "SG2") == "none"
    assert is_exchange("SG1", None) == "none"


def test_enrich_bin_output_and_groups():
    counts = np.array([[500, 2], [400, 3], [2, 500]])
    rownames = [("c1", 0, 100), ("c1", 100, 200), ("c1", 200, 300)]
    d_sg = {"c1": "SG1"}
    f1, f2 = io.StringIO(), io.StringIO()
    lines = enrich_bin(f1, f2, d_sg, counts, ["SG1", "SG2"], rownames)
    out = f1.getvalue().splitlines()
    assert out[0].split("\t")[0] == "#chrom"
    assert len(out) == 4
    # third window enriched for SG2 on an SG1 chromosome -> exchange
    cols = out[3].split("\t")
    assert cols[3] == "SG2" and cols[9] == "yes"
    groups = f2.getvalue().splitlines()
    assert len(groups) == 3  # header + SG1 run + SG2 run
    g1 = groups[1].split("\t")
    assert g1[:3] == ["c1", "0", "200"] and g1[5] == "2"
    g2 = groups[2].split("\t")
    assert g2[3] == "SG2" and g2[6] == "yes"


def test_enrich_features_ltr_ids():
    counts = np.array([[300, 1], [1, 300]])
    rownames = ["chrA:100-2000:ltr1", "chrB:50-900:ltr2"]
    d_sg = {"chrA": "SG1", "chrB": "SG1"}
    f = io.StringIO()
    d_enriched, d_exchange = enrich_features(f, d_sg, counts, ["SG1", "SG2"], rownames)
    assert d_enriched == {"chrA:100-2000:ltr1": "SG1", "chrB:50-900:ltr2": "SG2"}
    assert d_exchange["chrB:50-900:ltr2"] == "yes"
    out = f.getvalue().splitlines()
    assert out[0].split("\t") == ["#id", "subgenome", "p_value", "counts",
                                  "potential_exchange", "p_corrected"]


def test_write_bin_counts_sparse():
    arr = np.zeros((3, 2), dtype=np.int64)
    arr[1] = [4, 5]
    f = io.StringIO()
    write_bin_counts(f, [arr], ["c1"], [25], 10, ["SG1", "SG2"])
    lines = f.getvalue().splitlines()
    assert len(lines) == 2  # header + one non-empty bin
    assert lines[1] == "c1\t10\t20\t4\t5"
