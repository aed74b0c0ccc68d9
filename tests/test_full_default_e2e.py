"""Full-DEFAULT pipeline composition test: core + mapping + enrichment +
LTR (detect/classify/trees) + homoeologous blocks + circos in ONE
``Pipeline.run`` — the reference's default configuration
(reference __main__.py:328-729 runs every step unless disabled).

The subsystems are individually covered elsewhere; this test exists because
an integration stall (quadratic pass-2 classification) once escaped a suite
that only ever composed subsets.
"""

import numpy as np
import pytest

from tests.make_synthetic import make_genome


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    base = tmp_path_factory.mktemp("full_default")
    genome, cfg, hmm_db = make_genome(str(base), n_sets=2, chrom_size=120_000,
                                      with_ltr_domains=True)

    from subphaser_tpu.ltr.classify import PASS2_STATS
    from subphaser_tpu.phase.pipeline import Pipeline

    PASS2_STATS["pair_evals"] = -1  # sentinel: proves classify_pass2 ran
    pipe = Pipeline(
        [genome], [cfg],
        outdir=str(base / "out"), tmpdir=str(base / "tmp"),
        min_freq=40, replicates=30, tile_bases=1 << 16, figfmt="png",
        window_size=50_000, min_block=10_000, hmm_db=hmm_db,
        # NOTHING disabled: disable_ltr / disable_ltrtree / disable_blocks /
        # disable_circos all keep their False defaults.
    )
    pipe.run()
    return base / "out", pipe


def test_core_outputs(outdir):
    out, pipe = outdir
    path = out / "k15_q40_f2.chrom-subgenome.tsv"
    rows = [l.split("\t") for l in path.read_text().splitlines()[1:]]
    assign = {r[0]: r[1] for r in rows}
    a = {assign[c] for c in assign if c.startswith("A")}
    b = {assign[c] for c in assign if c.startswith("B")}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_ltr_outputs(outdir):
    out, _ = outdir
    for name in ["ltr.bin.count", "ltr.enrich", "ltr.insert.data"]:
        files = list(out.glob(f"*.{name}"))
        assert files and files[0].stat().st_size > 0, name


def test_classification_ran(outdir):
    """Pass-2 classification actually ran inside the composed pipeline (the
    stage whose quadratic stall once escaped the subset-only suite)."""
    from subphaser_tpu.ltr.classify import PASS2_STATS

    assert PASS2_STATS["pair_evals"] >= 0  # -1 sentinel was overwritten


def test_blocks_and_circos_outputs(outdir):
    out, pipe = outdir
    figs = list(out.glob("*.circos.png"))
    assert figs and figs[0].stat().st_size > 1000
    legend = list(out.glob("*.circos.legend.txt"))
    assert legend and legend[0].stat().st_size > 0
    # blocks emitted PAF files under tmp/Blocks
    import os
    blocks_dir = os.path.join(pipe.tmpdir, "Blocks")
    pafs = [f for f in os.listdir(blocks_dir) if f.endswith(".paf")]
    assert pafs, os.listdir(blocks_dir)
    # PAF lines parse and cover a sane span
    from subphaser_tpu.blocks.paf import parse_paf

    recs = list(parse_paf(os.path.join(blocks_dir, pafs[0])))
    assert recs and all(r.qend > r.qstart for r in recs)


def test_enrich_outputs(outdir):
    out, _ = outdir
    en = list(out.glob("*.bin.enrich"))[0].read_text().splitlines()
    assert len(en) > 3
