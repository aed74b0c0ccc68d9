import numpy as np

from subphaser_tpu.io.encoding import kmer_code
from subphaser_tpu.phase.cluster import SigKmers
from subphaser_tpu.phase.features import FeaturePack
from tests.oracle import revcomp
from tests.test_encoding import random_seq


def test_feature_pack_counts():
    k = 13
    rng = np.random.default_rng(9)
    sig_seqs = [random_seq(rng, k) for _ in range(6)]
    sgs = [0, 0, 0, 1, 1, 1]
    feats = []
    expected = []
    for fi in range(12):
        base = random_seq(rng, 400 + 37 * fi)
        n_hits = [0, 0]
        s = list(base)
        for j in range(fi % 4):
            which = (fi + j) % 6
            p = 30 * (j + 1)
            s[p : p + k] = list(sig_seqs[which])
        feats.append((f"chr{fi}:1-2:f{fi}", "".join(s)))
        # oracle: forward scan with dict incl. revcomp
        d = {}
        for seq, sg in zip(sig_seqs, sgs):
            d[seq] = sg
            d[revcomp(seq)] = sg
        seq = "".join(s)
        for i in range(len(seq) - k + 1):
            sub = seq[i : i + k]
            if sub in d:
                n_hits[d[sub]] += 1
        expected.append(n_hits)

    codes, code_sg = [], []
    for seq, sg in zip(sig_seqs, sgs):
        codes += [kmer_code(seq), kmer_code(revcomp(seq))]
        code_sg += [sg, sg]
    order = np.argsort(codes)
    sig = SigKmers(
        codes=np.array(codes, dtype=np.int32)[order],
        sg=np.array(code_sg, dtype=np.int32)[order],
        canon_codes=np.zeros(0, np.int32),
        canon_sg=np.zeros(0, np.int32),
        sg_names=["SG1", "SG2"],
    )
    pack = FeaturePack.build(feats, k)
    counts = pack.map_counts(sig, k, tile_bases=1 << 12)
    np.testing.assert_array_equal(counts, expected)


def test_no_cross_feature_kmers():
    """A k-mer spanning two adjacent features must not count."""
    k = 15
    rng = np.random.default_rng(10)
    half = random_seq(rng, 8)
    # significant k-mer formed only by concatenating feature ends
    kmer = half + random_seq(rng, k - 8)
    f1 = random_seq(rng, 100) + half
    f2 = kmer[8:] + random_seq(rng, 100)
    sig_codes = sorted([kmer_code(kmer), kmer_code(revcomp(kmer))])
    sig = SigKmers(
        codes=np.array(sig_codes, dtype=np.int32),
        sg=np.zeros(2, dtype=np.int32),
        canon_codes=np.zeros(0, np.int32),
        canon_sg=np.zeros(0, np.int32),
        sg_names=["SG1"],
    )
    pack = FeaturePack.build([("a", f1), ("b", f2)], k)
    counts = pack.map_counts(sig, k, tile_bases=1 << 12)
    assert counts.sum() == 0


def test_feature_pack_chrom_cap_split_parity(monkeypatch):
    """Features beyond CHROM_CAP split across multiple pseudo-chromosomes
    with IDENTICAL counts: one 4.6 Gbase concatenated chromosome overflowed
    the int32 tile starts at wheat scale (490k retained LTRs) and wedged
    the device worker mid-run. A tiny cap here forces the multi-chromosome
    path; the uncapped single-chromosome build is the oracle."""
    k = 13
    rng = np.random.default_rng(11)
    sig_seqs = [random_seq(rng, k) for _ in range(4)]
    sgs = [0, 0, 1, 1]
    feats = []
    for fi in range(10):
        s = list(random_seq(rng, 500 + 61 * fi))
        for j in range(fi % 3):
            p = 40 * (j + 1)
            s[p : p + k] = list(sig_seqs[(fi + j) % 4])
        feats.append((f"chr{fi}:1-2:f{fi}", "".join(s)))
    codes, code_sg = [], []
    for seq, sg in zip(sig_seqs, sgs):
        codes += [kmer_code(seq), kmer_code(revcomp(seq))]
        code_sg += [sg, sg]
    order = np.argsort(codes)
    sig = SigKmers(
        codes=np.array(codes, dtype=np.int32)[order],
        sg=np.array(code_sg, dtype=np.int32)[order],
        canon_codes=np.zeros(0, np.int32),
        canon_sg=np.zeros(0, np.int32),
        sg_names=["SG1", "SG2"],
    )
    oracle = FeaturePack.build(feats, k)
    assert len(oracle.genome.chroms) == 1
    want = oracle.map_counts(sig, k, tile_bases=1 << 12)
    monkeypatch.setattr(FeaturePack, "CHROM_CAP", 2048)
    pack = FeaturePack.build(feats, k)
    assert len(pack.genome.chroms) >= 3
    got = pack.map_counts(sig, k, tile_bases=1 << 12)
    np.testing.assert_array_equal(got, want)


def test_feature_map_host_matches_device(monkeypatch):
    """The default host-side feature mapping (k <= 15) must equal the
    device tile path exactly — same forward-code, all-k-valid, two-strand
    table semantics (the device path wedged the remote worker at wheat
    scale; SUBPHASER_FEATURE_MAP=device keeps it reachable)."""
    k = 13
    rng = np.random.default_rng(21)
    sig_seqs = [random_seq(rng, k) for _ in range(6)]
    sgs = [0, 1, 2, 0, 1, 2]
    feats = []
    for fi in range(9):
        s = list(random_seq(rng, 700 + 91 * fi))
        for j in range(fi % 4):
            p = 50 * (j + 1)
            s[p : p + k] = list(sig_seqs[(fi + j) % 6])
        if fi == 4:  # embed an N-run: invalid k-mers must not count
            s[100:120] = ["N"] * 20
        feats.append((f"c{fi}:1-2:f{fi}", "".join(s)))
    codes, code_sg = [], []
    for seq, sg in zip(sig_seqs, sgs):
        codes += [kmer_code(seq), kmer_code(revcomp(seq))]
        code_sg += [sg, sg]
    order = np.argsort(codes)
    sig = SigKmers(
        codes=np.array(codes, dtype=np.int32)[order],
        sg=np.array(code_sg, dtype=np.int32)[order],
        canon_codes=np.zeros(0, np.int32),
        canon_sg=np.zeros(0, np.int32),
        sg_names=["SG1", "SG2", "SG3"],
    )
    pack = FeaturePack.build(feats, k)
    host = pack.map_counts(sig, k, tile_bases=1 << 12)
    monkeypatch.setenv("SUBPHASER_FEATURE_MAP", "device")
    dev = pack.map_counts(sig, k, tile_bases=1 << 12)
    np.testing.assert_array_equal(host, dev)
    assert host.sum() > 0
