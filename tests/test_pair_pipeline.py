"""k in [16, 31] paths: pair counting + mapping oracles and a k=17 e2e run."""

import numpy as np
import pytest

from subphaser_tpu.io.encoding import codes_to_kmers, kmer_code
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ops.count_pair import PairSpectrumAccumulator, count_tile_batch_pair
from tests.oracle import count_canonical_kmers, map_kmers_to_bins, revcomp
from tests.test_encoding import random_seq


@pytest.mark.parametrize("k", [17, 23, 31])
def test_pair_counting_oracle(k):
    rng = np.random.default_rng(k)
    unit = random_seq(rng, 150)
    seq = unit * 8 + random_seq(rng, 3000, n_frac=0.02)
    g = PackedGenome.from_dict({"c": seq})
    acc = PairSpectrumAccumulator()
    for t in g.tiles(k, tile_bases=1024):
        hi, lo, c = count_tile_batch_pair(t.words, t.vwords, k, 1024 // 16)
        acc.add(hi, lo, c)
    codes, counts = acc.finish(1)
    got = dict(zip(codes_to_kmers(codes, k).tolist(), counts.tolist()))
    assert got == count_canonical_kmers(seq, k)
    assert np.all(np.diff(codes) > 0)


def test_pair_counting_lower_threshold():
    k = 17
    rng = np.random.default_rng(1)
    unit = random_seq(rng, 100)
    seq = unit * 5 + random_seq(rng, 2000)
    g = PackedGenome.from_dict({"c": seq})
    acc = PairSpectrumAccumulator()
    for t in g.tiles(k, tile_bases=1024):
        hi, lo, c = count_tile_batch_pair(t.words, t.vwords, k, 1024 // 16)
        acc.add(hi, lo, c)
    codes, counts = acc.finish(3)
    oracle = count_canonical_kmers(seq, k, lower_count=3)
    got = dict(zip(codes_to_kmers(codes, k).tolist(), counts.tolist()))
    assert got == oracle


def test_pair_mapping_oracle():
    k, bin_size, n_sg = 19, 128, 2
    rng = np.random.default_rng(5)
    seq = random_seq(rng, 4000, n_frac=0.01)
    d_kmers = {}
    for pos in range(0, 3500, 53):
        kmer = seq[pos : pos + k]
        if "N" in kmer:
            continue
        sg = (pos // 700) % n_sg
        d_kmers[kmer] = sg
        d_kmers[revcomp(kmer)] = sg
    codes = np.array(sorted(kmer_code(s) for s in d_kmers), dtype=np.int64)
    sgs = np.array([d_kmers[s] for s in sorted(d_kmers, key=kmer_code)], dtype=np.int32)

    from subphaser_tpu.ops.mapbins_pair import map_genome_bins_pair

    g = PackedGenome.from_dict({"c": seq})
    acc = map_genome_bins_pair(g, codes, sgs, k, 1024, bin_size, n_sg)
    expected = map_kmers_to_bins(seq, d_kmers, k, bin_size, n_sg)
    got = acc.per_chrom[0]
    for b in range(got.shape[0]):
        np.testing.assert_array_equal(
            got[b], expected.get(b, [0] * n_sg), err_msg=f"bin {b}"
        )
    hit_codes = {kmer_code(s) for s in d_kmers if s in
                 {seq[i:i+k] for i in range(len(seq)-k+1)}}
    assert acc.mapped_kmer_count == len(hit_codes)


def test_k17_pipeline_e2e(tmp_path):
    from tests.make_synthetic import make_genome

    genome, cfg = make_genome(str(tmp_path), n_sets=2, chrom_size=80_000)
    from subphaser_tpu.phase.pipeline import Pipeline

    pipe = Pipeline(
        [genome], [cfg], k=17,
        outdir=str(tmp_path / "out"), tmpdir=str(tmp_path / "tmp"),
        min_freq=40, replicates=10, tile_bases=1 << 16, figfmt="png",
        disable_ltr=True, disable_circos=True, window_size=40_000,
    )
    pipe.run()
    out = tmp_path / "out"
    tsv = next(out.glob("*.chrom-subgenome.tsv")).read_text().splitlines()
    assign = {l.split("\t")[0]: l.split("\t")[1] for l in tsv[1:]}
    a = {assign[c] for c in assign if c.startswith("A")}
    b = {assign[c] for c in assign if c.startswith("B")}
    assert len(a) == 1 and len(b) == 1 and a != b
    # 17-mer strings in the sig file
    sig = next(out.glob("*.sig.kmer-subgenome.tsv")).read_text().splitlines()
    kmer = sig[1].split("\t")[0]
    assert len(kmer) == 17 and set(kmer) <= set("ACGT")
    # bin counts present
    bc = next(out.glob("*.subgenome.bin.count")).read_text().splitlines()
    assert len(bc) > 3


def test_pair_accumulator_spill_path():
    """Tiny device budget forces premerge + host spill; results stay exact."""
    k = 17
    rng = np.random.default_rng(9)
    unit = random_seq(rng, 120)
    seq = unit * 6 + random_seq(rng, 4000)
    g = PackedGenome.from_dict({"c": seq})
    acc = PairSpectrumAccumulator(device_budget=1 << 10)
    for t in g.tiles(k, tile_bases=512):
        hi, lo, c = count_tile_batch_pair(t.words, t.vwords, k, 512 // 16)
        acc.add(hi, lo, c)
    assert acc.spilled, "expected host spills with a tiny budget"
    codes, counts = acc.finish(3)
    oracle = count_canonical_kmers(seq, k, lower_count=3)
    got = dict(zip(codes_to_kmers(codes, k).tolist(), counts.tolist()))
    assert got == oracle


def test_pair_mapping_oracle_k31_with_polyt():
    """k=31 mapping: positions map correctly even with poly-T runs in the
    genome (forward hi can equal SENTINEL; only exact T^31 windows are
    skipped — the documented deviation in ops/kmer_pair)."""
    k, bin_size, n_sg = 31, 128, 2
    rng = np.random.default_rng(7)
    seq = (random_seq(rng, 900, n_frac=0.0) + "T" * 50
           + random_seq(rng, 1200, n_frac=0.0))
    d_kmers = {}
    for pos in range(0, 1800, 61):
        kmer = seq[pos : pos + k]
        # skip the poly-T 31-mer: positions whose FORWARD 31-mer is T^31
        # alias the pad pair and are unmappable (documented deviation)
        if "N" in kmer or len(kmer) < k or set(kmer) == {"T"}:
            continue
        sg = (pos // 700) % n_sg
        d_kmers[kmer] = sg
        d_kmers[revcomp(kmer)] = sg
    # include a sig k-mer overlapping the poly-T run (hi == SENTINEL form)
    kx = seq[890 : 890 + k]
    d_kmers[kx] = 1
    d_kmers[revcomp(kx)] = 1
    codes = np.array(sorted(kmer_code(s) for s in d_kmers), dtype=np.int64)
    sgs = np.array([d_kmers[s] for s in sorted(d_kmers, key=kmer_code)],
                   dtype=np.int32)

    from subphaser_tpu.ops.mapbins_pair import map_genome_bins_pair

    g = PackedGenome.from_dict({"c": seq})
    acc = map_genome_bins_pair(g, codes, sgs, k, 1024, bin_size, n_sg)
    expected = map_kmers_to_bins(seq, d_kmers, k, bin_size, n_sg)
    got = acc.per_chrom[0]
    for b in range(got.shape[0]):
        np.testing.assert_array_equal(
            got[b], expected.get(b, [0] * n_sg), err_msg=f"bin {b}"
        )
