"""End-to-end pipeline test on a synthetic allotetraploid genome."""

import os

import numpy as np
import pytest

from tests.make_synthetic import make_genome


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    genome, cfg = make_genome(str(base), n_sets=3, chrom_size=100_000)

    from subphaser_tpu.phase.pipeline import Pipeline

    pipe = Pipeline(
        [genome], [cfg],
        outdir=str(base / "out"), tmpdir=str(base / "tmp"),
        min_freq=50, replicates=50, tile_bases=1 << 16, figfmt="png",
        disable_ltr=True, disable_circos=True, window_size=50_000,
    )
    pipe.run()
    return base / "out", pipe


def test_assignments(outdir):
    out, pipe = outdir
    path = out / "k15_q50_f2.chrom-subgenome.tsv"
    rows = [l.split("\t") for l in path.read_text().splitlines()[1:]]
    assign = {r[0]: r[1] for r in rows}
    a = {assign[c] for c in assign if c.startswith("A")}
    b = {assign[c] for c in assign if c.startswith("B")}
    assert len(a) == 1 and len(b) == 1 and a != b
    # high bootstrap support on clean synthetic data
    assert all(int(r[2]) >= 90 for r in rows)


def test_sig_kmers_file(outdir):
    out, _ = outdir
    path = out / "k15_q50_f2.sig.kmer-subgenome.tsv"
    lines = path.read_text().splitlines()
    assert lines[0] == "#kmer\tsubgenome\tp_value\tratios"
    assert len(lines) > 20
    kmer, sg, p, ratios = lines[1].split("\t")
    assert len(kmer) == 15 and set(kmer) <= set("ACGT")
    assert sg in ("SG1", "SG2")
    assert 0 <= float(p) <= 1
    assert len(ratios.split(",")) == 2


def test_matrix_file_roundtrip(outdir):
    out, pipe = outdir
    from subphaser_tpu.phase.cluster import load_matrix_file

    path = str(out / "k15_q50_f2.kmer.mat")
    m = load_matrix_file(path, 15)
    assert m.labels == pipe.chrom_labels
    assert m.freqs.shape[0] > 20
    assert np.all(m.freqs >= 0)


def test_bin_count_and_enrich(outdir):
    out, pipe = outdir
    bc = (out / "k15_q50_f2.subgenome.bin.count").read_text().splitlines()
    assert bc[0].startswith("#chrom\tstart\tend\t")
    # bins are 10 kb and counts positive
    first = bc[1].split("\t")
    assert int(first[2]) - int(first[1]) <= 10000
    assert sum(int(v) for v in first[3:]) > 0

    en = (out / "k15_q50_f2.bin.enrich").read_text().splitlines()
    assert len(en) > 3
    cols = en[1].split("\t")
    assert cols[3] in ("SG1", "SG2", "None")
    assert len(cols) == 11
    # synthetic data: every A-chrom window enriched for the A subgenome
    assign = dict(pipe.d_sg)
    for line in en[1:]:
        c = line.split("\t")
        if c[3] != "None":
            assert c[3] == assign[c[0]]
            assert c[9] == "no"

    grp = (out / "k15_q50_f2.bin.group").read_text().splitlines()
    assert grp[0].startswith("#chrom\tstart\tend\texchange_from")


def test_figures_written(outdir):
    out, _ = outdir
    for name in ["k15_q50_f2.kmer_freq.png", "k15_q50_f2.kmer_pca.png",
                 "k15_q50_f2.kmer.mat.png"]:
        assert (out / name).stat().st_size > 1000, name


def test_map_checkpoint_resume_mid_mapping(tmp_path, caplog, monkeypatch):
    """A crash mid-mapping resumes from per-chromosome checkpoints without
    recomputing the finished chromosomes (reference granularity:
    __main__.py:478-487 sg_map checkpoint)."""
    import logging

    import subphaser_tpu.ops.mapbins as mapbins_mod
    from subphaser_tpu.phase.pipeline import Pipeline

    genome, cfg = make_genome(str(tmp_path), n_sets=3, chrom_size=100_000)
    kwargs = dict(
        min_freq=50, replicates=50, tile_bases=1 << 16, figfmt="png",
        disable_ltr=True, disable_circos=True, window_size=50_000,
    )
    real = mapbins_mod.map_tiles_batch
    calls_ref = {"n": 0}

    def counting_ref(*a, **kw):
        calls_ref["n"] += 1
        return real(*a, **kw)

    # uninterrupted reference run, counting the mapping dispatches
    monkeypatch.setattr(mapbins_mod, "map_tiles_batch", counting_ref)
    Pipeline([genome], [cfg], outdir=str(tmp_path / "out_ref"),
             tmpdir=str(tmp_path / "tmp_ref"), **kwargs).run()
    n_batches = calls_ref["n"]
    assert n_batches >= 6  # one per chromosome minimum

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == n_batches:  # crash on the last mapping dispatch
            raise Boom("simulated crash mid-mapping")
        return real(*a, **kw)

    monkeypatch.setattr(mapbins_mod, "map_tiles_batch", crashing)
    with pytest.raises(Boom):
        Pipeline([genome], [cfg], outdir=str(tmp_path / "out"),
                 tmpdir=str(tmp_path / "tmp"), **kwargs).run()
    saved = [p for p in os.listdir(tmp_path / "tmp")
             if p.startswith("map_bins_") and p.endswith(".ok.json")]
    assert saved, "no per-chromosome mapping checkpoint written before crash"

    # resume: same tmpdir; count only the mapping dispatches
    calls2 = {"n": 0}

    def counting(*a, **kw):
        calls2["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mapbins_mod, "map_tiles_batch", counting)
    with caplog.at_level(logging.INFO, logger="subphaser_tpu"):
        Pipeline([genome], [cfg], outdir=str(tmp_path / "out"),
                 tmpdir=str(tmp_path / "tmp"), **kwargs).run()
    assert any("Resumed mapping from checkpoint" in r.message
               for r in caplog.records)
    # the checkpointed chromosomes must not be re-dispatched
    assert calls2["n"] <= n_batches - len(saved) * (n_batches // 6)

    for fname in ["k15_q50_f2.subgenome.bin.count", "k15_q50_f2.bin.enrich"]:
        ref = (tmp_path / "out_ref" / fname).read_bytes()
        res = (tmp_path / "out" / fname).read_bytes()
        assert ref == res, f"{fname} differs after resume"


def test_checkpoint_resume(outdir, caplog):
    out, pipe = outdir
    import logging

    from subphaser_tpu.phase.pipeline import Pipeline

    base = out.parent
    with caplog.at_level(logging.INFO, logger="subphaser_tpu"):
        pipe2 = Pipeline(
            pipe.genomes, pipe.sg_cfgs,
            outdir=str(out), tmpdir=str(base / "tmp"),
            min_freq=50, replicates=50, tile_bases=1 << 16, figfmt="png",
            disable_ltr=True, disable_circos=True, window_size=50_000,
            just_core=True,
        )
        pipe2.run()
    assert any("checkpoint" in r.message for r in caplog.records)
    assert dict(pipe2.d_sg) == dict(pipe.d_sg)
