"""CLI option paths: -sg_assigned, -target, multi-genome labels,
-custom_features, -chr_ordered, -just_core."""

import gzip
import os

import numpy as np
import pytest

from tests.make_synthetic import make_genome


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip")
    make_genome(str(d), n_sets=2, chrom_size=80_000)
    return d


def run_cli(args):
    from subphaser_tpu.cli import main

    main([str(a) for a in args])


def test_sg_assigned_skips_clustering(base, caplog):
    assigned = base / "assigned.tsv"
    assigned.write_text("A1\tSGX\nB1\tSGY\nA2\tSGX\nB2\tSGY\n")
    out = base / "out_assigned"
    run_cli([
        "-i", base / "genome.fa.gz", "-c", base / "sg.config",
        "-o", out, "-tmpdir", base / "tmp_assigned",
        "-q", "40", "-replicates", "10", "-tile_bases", 1 << 16,
        "-sg_assigned", assigned, "-just_core", "-figfmt", "png",
    ])
    tsv = next(out.glob("*.chrom-subgenome.tsv")).read_text().splitlines()
    assign = {l.split("\t")[0]: l.split("\t")[1] for l in tsv[1:]}
    assert assign["A1"] == assign["A2"]
    assert assign["B1"] == assign["B2"]
    assert assign["A1"] != assign["B1"]


def test_target_subset(base):
    # restrict to the first homoeologous set only
    target = base / "target.tsv"
    target.write_text("CMA1.1 A1\nCMB1.1 B1\n")
    out = base / "out_target"
    run_cli([
        "-i", base / "genome.fa.gz", "-c", base / "sg.config",
        "-o", out, "-tmpdir", base / "tmp_target",
        "-q", "20", "-replicates", "10", "-tile_bases", 1 << 16,
        "-target", target, "-just_core", "-figfmt", "png",
    ])
    tsv = next(out.glob("*.chrom-subgenome.tsv")).read_text().splitlines()
    chroms = {l.split("\t")[0] for l in tsv[1:]}
    assert chroms == {"A1", "B1"}


def test_multi_genome_prefix_labels(base, tmp_path):
    # split the genome into two files; prefix labels avoid id conflicts
    from subphaser_tpu.io.fasta import iter_fasta, write_fasta

    recs = list(iter_fasta(str(base / "genome.fa.gz")))
    half = len(recs) // 2
    write_fasta(str(tmp_path / "g1.fa"), [(r[0], r[2]) for r in recs[:half]])
    write_fasta(str(tmp_path / "g2.fa"), [(r[0], r[2]) for r in recs[half:]])
    # config tokens must carry the prefixes
    cfg_lines = []
    for line in (base / "sg.config").read_text().splitlines():
        if line.startswith("#"):
            continue
        cols = line.split("\t")

        def prefix_tok(tok):
            out = []
            for part in tok.split(","):
                new, _, old = part.partition("|")
                pref = "1-" if any(r[0] == old for r in recs[:half]) else "2-"
                out.append(f"{new}|{pref}{old}")
            return ",".join(out)

        cfg_lines.append("\t".join(prefix_tok(c) for c in cols))
    cfg = tmp_path / "multi.config"
    cfg.write_text("\n".join(cfg_lines) + "\n")
    out = tmp_path / "out_multi"
    run_cli([
        "-i", tmp_path / "g1.fa", tmp_path / "g2.fa", "-c", cfg,
        "-o", out, "-tmpdir", tmp_path / "tmp_multi",
        "-q", "40", "-replicates", "10", "-tile_bases", 1 << 16,
        "-just_core", "-figfmt", "png",
    ])
    tsv = next(out.glob("*.chrom-subgenome.tsv")).read_text().splitlines()
    assert len(tsv) == 5  # header + 4 chroms


def test_custom_features(base):
    from subphaser_tpu.io.fasta import iter_fasta, write_fasta

    # custom features = slices of chromosomes (carry SG-specific repeats)
    recs = list(iter_fasta(str(base / "genome.fa.gz")))
    feats = []
    for rid, _d, seq in recs:
        s = seq.tobytes().decode()
        feats.append((f"feat_{rid}", s[10_000:30_000]))
    featfa = base / "features.fa"
    write_fasta(str(featfa), feats)
    out = base / "out_feat"
    run_cli([
        "-i", base / "genome.fa.gz", "-c", base / "sg.config",
        "-o", out, "-tmpdir", base / "tmp_feat",
        "-q", "40", "-replicates", "10", "-tile_bases", 1 << 16,
        "-custom_features", featfa, "-disable_ltr", "-disable_circos",
        "-figfmt", "png", "-window_size", "40000",
    ])
    enrich = next(out.glob("*.custom.enrich")).read_text().splitlines()
    assert enrich[0].startswith("#id")
    assert len(enrich) > 2
    count = next(out.glob("*.custom.bin.count")).read_text().splitlines()
    assert count[0].startswith("#chrom")


def test_chr_ordered_and_cleanup(base, tmp_path):
    order = tmp_path / "order.txt"
    order.write_text("B1\nA1\nB2\nA2\n")
    out = tmp_path / "out_ord"
    tmpd = tmp_path / "tmp_ord"
    run_cli([
        "-i", base / "genome.fa.gz", "-c", base / "sg.config",
        "-o", out, "-tmpdir", tmpd,
        "-q", "40", "-replicates", "10", "-tile_bases", 1 << 16,
        "-chr_ordered", order, "-disable_ltr", "-disable_blocks",
        "-figfmt", "png", "-window_size", "40000", "-cleanup",
        "-min_block", "10000",
    ])
    assert next(out.glob("*.circos.png")).stat().st_size > 10_000
    assert not tmpd.exists()  # -cleanup removed it
