"""End-to-end LTR step: detection -> enrichment -> age -> tree on synthetic data."""

import numpy as np
import pytest

from tests.make_synthetic import make_genome


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    base = tmp_path_factory.mktemp("ltr_e2e")
    genome, cfg = make_genome(str(base), n_sets=2, chrom_size=120_000, with_ltr=True)

    from subphaser_tpu.phase.pipeline import Pipeline

    pipe = Pipeline(
        [genome], [cfg],
        outdir=str(base / "out"), tmpdir=str(base / "tmp"),
        min_freq=40, replicates=30, tile_bases=1 << 16, figfmt="png",
        disable_circos=True, window_size=50_000,
    )
    pipe.run()
    return base / "out", pipe


def test_ltr_outputs_exist(outdir):
    out, _ = outdir
    for name in ["ltr.bin.count", "ltr.enrich", "ltr.insert.data",
                 "ltr.insert.summary"]:
        files = list(out.glob(f"*.{name}"))
        assert files and files[0].stat().st_size > 0, name


def test_ltr_enrichment_consistent(outdir):
    out, pipe = outdir
    enrich = list(out.glob("*.ltr.enrich"))[0].read_text().splitlines()
    assert enrich[0].startswith("#id\tsubgenome")
    n_sig = 0
    for line in enrich[1:]:
        cols = line.split("\t")
        if cols[1] == "None":
            continue
        n_sig += 1
        # planted SG-specific LTR families: enrichment should match the
        # chromosome's subgenome (id = chrom:start-end:...)
        chrom = cols[0].split(":")[0]
        if cols[4] != "none":
            assert cols[4] in ("no", "yes")
    assert n_sig > 3


def test_ltr_age_data(outdir):
    out, _ = outdir
    data = list(out.glob("*.ltr.insert.data"))[0].read_text().splitlines()
    assert data[0] == "ltr\tsg\tage"
    ages = [float(l.split("\t")[2]) for l in data[1:]]
    assert all(a >= 0 for a in ages)
    assert len(ages) > 3


def test_ltr_tree_outputs(outdir):
    out, _ = outdir
    nwk = list(out.glob("*.tree.nwk"))
    if not nwk:  # tree needs >= 4 members per group
        pytest.skip("too few LTRs for a tree in this small synthetic run")
    tree = nwk[0].read_text().strip()
    assert tree.endswith(";") and tree.count("(") > 1
