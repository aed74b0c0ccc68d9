"""-alt_cfgs: alternative homoeologous sets for block alignment only."""

import numpy as np

from tests.make_synthetic import make_genome


def test_alt_cfgs_changes_block_pairs(tmp_path):
    genome, cfg = make_genome(str(tmp_path), n_sets=2, chrom_size=60_000)
    # alternative config pairs A1-B2 and A2-B1 instead
    alt = tmp_path / "alt.config"
    alt.write_text("A1|CMA1.1\tB2|CMB2.1\nA2|CMA2.1\tB1|CMB1.1\n")

    from subphaser_tpu.phase.pipeline import Pipeline

    pipe = Pipeline(
        [genome], [cfg], alt_cfgs=[str(alt)],
        outdir=str(tmp_path / "out"), tmpdir=str(tmp_path / "tmp"),
        min_freq=40, replicates=10, tile_bases=1 << 16, figfmt="png",
        disable_ltr=True, window_size=30_000, min_block=5_000,
    )
    pipe.run()
    import os

    pafs = sorted(os.listdir(tmp_path / "tmp" / "Blocks"))
    assert pafs == ["A1-B2.paf", "A2-B1.paf"]
