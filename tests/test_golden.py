"""Golden regression pins: exact outputs of a fixed synthetic run.

These freeze semantically meaningful values (not byte digests) so future
rounds catch unintended changes to counting/filtering/clustering while
allowing format-neutral refactors. If a change legitimately alters these
numbers, update them consciously.
"""

import numpy as np
import pytest

from tests.make_synthetic import make_genome


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    base = tmp_path_factory.mktemp("golden")
    genome, cfg = make_genome(str(base), n_sets=2, chrom_size=80_000, seed=0)

    from subphaser_tpu.phase.pipeline import Pipeline

    pipe = Pipeline(
        [genome], [cfg],
        outdir=str(base / "out"), tmpdir=str(base / "tmp"),
        min_freq=40, replicates=20, tile_bases=1 << 16, figfmt="png",
        disable_ltr=True, disable_circos=True, window_size=40_000, seed=0,
    )
    pipe.run()
    return base / "out", pipe


def test_golden_assignments(run):
    out, pipe = run
    assert dict(pipe.d_sg) == {
        "A1": "SG1", "B1": "SG2", "A2": "SG1", "B2": "SG2",
    }
    bs = pipe.cluster.d_bs
    assert set(bs) == {"A1", "B1", "A2", "B2"}
    assert all(v == 100 for v in bs.values()), bs
    assert pipe.cluster.mean_ari == 1.0
    assert pipe.cluster.mean_vm == 1.0


def test_golden_counts(run):
    out, pipe = run
    mat = (out / "k15_q40_f2.kmer.mat").read_text().splitlines()
    # differential k-mer count is fully determined by the seeded generator
    assert len(mat) - 1 == 212
    header = mat[0].split("\t")
    assert header == ["kmer", "A1", "A2", "B1", "B2"]
    # first row: specific 15-mer with expected normalized freq pattern
    first = mat[1].split("\t")
    assert len(first[0]) == 15
    vals = [float(v) for v in first[1:]]
    present = [v > 0 for v in vals]
    # SG-specific: present on exactly one subgenome's chromosomes
    assert present in ([True, True, False, False], [False, False, True, True])


def test_golden_sig_and_bins(run):
    out, _ = run
    sig = (out / "k15_q40_f2.sig.kmer-subgenome.tsv").read_text().splitlines()
    assert len(sig) - 1 == 212  # all differential k-mers significant here
    bc = (out / "k15_q40_f2.subgenome.bin.count").read_text().splitlines()
    counts = np.array([[int(v) for v in l.split("\t")[3:]] for l in bc[1:]])
    assert counts.sum() == 15718  # total mapped hits, pinned
