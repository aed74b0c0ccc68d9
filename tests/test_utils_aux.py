"""Aux subsystems: pool/retry, profiling, density tools, shared features."""

import numpy as np
import pytest

from subphaser_tpu.utils.pool import pool_map, run_tasks
from subphaser_tpu.utils.profiling import Throughput, timed


def test_pool_map_ordered():
    assert pool_map(lambda x: x * 2, list(range(20)), workers=4) == [
        x * 2 for x in range(20)
    ]


def test_run_tasks_retries_flaky():
    calls = {}

    def flaky(x):
        calls[x] = calls.get(x, 0) + 1
        if x == 3 and calls[x] < 3:
            raise RuntimeError("transient")
        return x + 100

    out = run_tasks(flaky, list(range(5)), workers=2, retry=3, backoff=0)
    assert out == [100, 101, 102, 103, 104]
    assert calls[3] == 3


def test_run_tasks_raises_persistent():
    with pytest.raises(RuntimeError, match="failed after"):
        run_tasks(lambda x: 1 / 0, [1], retry=2, backoff=0)


def test_throughput_meter():
    t = Throughput("test", unit="items")
    t.start()
    t.stop(100)
    assert t.rate > 0
    with timed("noop"):
        pass


def test_density_tools(tmp_path):
    from subphaser_tpu.viz.density import (
        bed_density, gc_density, gene_density, variant_density, write_density,
    )

    gff = tmp_path / "a.gff3"
    gff.write_text(
        "##gff3\nc1\tsrc\tgene\t100\t500\t.\t+\t.\tID=g1\n"
        "c1\tsrc\tmRNA\t100\t500\t.\t+\t.\tID=m1\n"
        "c1\tsrc\tgene\t150000\t151000\t.\t+\t.\tID=g2\n"
    )
    d = gene_density(str(gff), window_size=100_000)
    assert d == {"c1": {0: 1, 1: 1}}

    vcf = tmp_path / "a.vcf"
    vcf.write_text(
        "##vcf\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c1\t5\t.\tA\tT\t.\t.\t.\tGT\t0/1\n"
        "c1\t6\t.\tA\tT\t.\t.\t.\tGT\t1/1\n"
    )
    d = variant_density(str(vcf), window_size=100)
    assert d == {"c1": {0: 2}}
    d = variant_density(str(vcf), window_size=100, het_only=True)
    assert d == {"c1": {0: 1}}

    fa = tmp_path / "a.fa"
    fa.write_text(">c1\n" + "G" * 50 + "A" * 50 + "\n")
    d = gc_density(str(fa), window_size=100)
    assert d["c1"][0] == 50.0

    bed = tmp_path / "a.bed"
    bed.write_text("c1\t10\t20\nc1\t150\t160\n")
    d = bed_density(str(bed), window_size=100)
    assert d == {"c1": {0: 1, 1: 1}}
    out = tmp_path / "dens.txt"
    write_density(d, str(out), 100)
    assert out.read_text() == "c1 0 100 1\nc1 100 200 1\n"


def test_shared_features():
    from subphaser_tpu.phase.shared import shared_features
    from subphaser_tpu.io.encoding import canonical_code, kmer_code
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(0)
    k = 13
    core = random_seq(rng, 300)
    # SG spectra that both contain the core's k-mers at balanced depth
    from subphaser_tpu.phase.shared import _seq_kmer_codes

    codes = np.unique(canonical_code(_seq_kmer_codes(core, k), k))
    spectra = [
        (codes, np.full(codes.size, 50, dtype=np.int64)),
        (codes, np.full(codes.size, 51, dtype=np.int64)),
    ]
    shared_rec = ("shared1", core)
    unique_rec = ("unique1", random_seq(rng, 300))
    out = shared_features(
        [shared_rec, unique_rec], ["SG1", "SG2"], spectra, k,
        min_prob=0.5, min_count=5, max_fold=1.2,
    )
    assert "shared1" in out
    assert "unique1" not in out


def test_stat_enrich(tmp_path):
    from subphaser_tpu.phase.stat_enrich import stat_enrich
    import io as _io

    tsv = tmp_path / "x.enrich"
    tsv.write_text(
        "#id\tsubgenome\tp_value\tcounts\n"
        "Gypsy-1\tSG1\t0.01\t5,1\n"
        "Gypsy-2\tSG1\t0.02\t3,0\n"
        "Copia-1\tSG2\t0.01\t0,7\n"
    )
    out = _io.StringIO()
    stat_enrich(str(tsv), out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "Copia\t0\t1\t0\t7"
    assert lines[1] == "Gypsy\t2\t0\t8\t1"


def test_cut_seqs_and_split(tmp_path):
    from subphaser_tpu.io.split import balanced_chunks, cut_seqs, split_fasta_balanced
    from subphaser_tpu.io.fasta import iter_fasta, write_fasta
    import io as _io

    write_fasta(str(tmp_path / "a.fa"), [("c1", "A" * 250), ("c2", "C" * 90)])
    out = _io.StringIO()
    offsets = cut_seqs(str(tmp_path / "a.fa"), out, window_size=100, window_ovl=20)
    assert offsets["c1:1-120"] == ("c1", 0)
    assert offsets["c1:101-220"] == ("c1", 100)
    assert offsets["c1:201-250"] == ("c1", 200)
    assert offsets["c2:1-90"] == ("c2", 0)

    chunks = balanced_chunks({"a": 100, "b": 90, "c": 50, "d": 40}, 2)
    tot = sorted(sum({"a": 100, "b": 90, "c": 50, "d": 40}[x] for x in ch) for ch in chunks)
    assert tot == [140, 140]

    files = split_fasta_balanced(str(tmp_path / "a.fa"), str(tmp_path / "s"), 2)
    assert len(files) == 2
    names = set()
    for f in files:
        names |= {rid for rid, _d, _s in iter_fasta(f)}
    assert names == {"c1", "c2"}
