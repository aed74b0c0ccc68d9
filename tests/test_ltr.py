"""LTR subsystem tests: native lib, detection, records, age, classification."""

import io
import math

import numpy as np
import pytest

from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ltr import native
from subphaser_tpu.ltr.detect import detect_ltr, parse_harvest_options
from subphaser_tpu.ltr.records import (
    LTRRecord,
    parse_scn,
    resolve_overlaps,
    write_scn,
)
from tests.test_encoding import random_seq


def _mutate(rng, s, rate):
    out = []
    for ch in s:
        if rng.random() < rate:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        else:
            out.append(ch)
    return "".join(out)


def make_element(rng, ltr_len=400, internal_len=3000, div=0.05, tsd_len=5):
    ltr = random_seq(rng, ltr_len)
    tsd = random_seq(rng, tsd_len)
    element = ltr + random_seq(rng, internal_len) + _mutate(rng, ltr, div)
    return tsd + element + tsd, len(tsd), len(element)


def test_banded_identity():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 300).astype(np.uint8)
    ident = native.banded_identity(a, a)
    assert ident == 1.0
    b = a.copy()
    b[::10] = (b[::10] + 1) % 4
    ident2 = native.banded_identity(a, b)
    assert 0.85 <= ident2 <= 0.92


def test_detect_planted_elements():
    rng = np.random.default_rng(1)
    parts = [random_seq(rng, 15000)]
    expected = []
    pos = 15000
    for _ in range(3):
        block, tsd_len, elem_len = make_element(rng)
        expected.append((pos + tsd_len, pos + tsd_len + elem_len))
        parts.append(block)
        parts.append(random_seq(rng, 18000))
        pos += len(block) + 18000
    seq = "".join(parts)
    g = PackedGenome.from_dict({"c1": seq})
    recs = detect_ltr(g, tile_bases=1 << 16)
    assert len(recs) >= 3
    for es, ee in expected:
        hits = [r for r in recs if abs(r.start - 1 - es) <= 10 and abs(r.end - ee) <= 10]
        assert hits, f"element at {es}-{ee} not found"
        r = hits[0]
        assert 380 <= r.lltr <= 420
        assert 85 <= r.similarity <= 100


def test_detect_across_tile_boundary():
    rng = np.random.default_rng(2)
    block, tsd_len, elem_len = make_element(rng)
    tile = 1 << 16
    seq = random_seq(rng, tile - 2000) + block + random_seq(rng, 8000)
    g = PackedGenome.from_dict({"c1": seq})
    recs = detect_ltr(g, tile_bases=tile)
    es = tile - 2000 + tsd_len
    hits = [r for r in recs if abs(r.start - 1 - es) <= 10]
    assert hits, "element spanning tile boundary missed"
    assert len(hits) == 1, "element found twice (overlap dedupe failed)"


def test_detect_high_copy_family():
    """An element whose LTR k-mers are shared by >16 other family copies in
    the tile must still be detected. Regression for seed-pair shift capping:
    seed_pairs sorts on (code, position) — with an UNSTABLE tie order the
    element's own two LTRs can sit more than max_shift run-mates apart and
    the pair is lost."""
    rng = np.random.default_rng(3)
    fam_ltr = random_seq(rng, 400)
    tsd = random_seq(rng, 5)
    internal = random_seq(rng, 3000)
    element = tsd + fam_ltr + internal + _mutate(rng, fam_ltr, 0.02) + tsd
    parts = [random_seq(rng, 2000)]
    # 24 solo copies, spaced > maxdistltr so solo-solo pairs are invalid
    for _ in range(24):
        parts.append(fam_ltr)
        parts.append(random_seq(rng, 15100))
    pos = sum(len(p) for p in parts)
    parts.append(element)
    parts.append(random_seq(rng, 16000))
    seq = "".join(parts)
    g = PackedGenome.from_dict({"c1": seq})
    recs = detect_ltr(g, tile_bases=1 << 19)
    es = pos + 5
    ee = es + 400 + 3000 + 400
    hits = [r for r in recs if abs(r.start - 1 - es) <= 30 and abs(r.end - ee) <= 30]
    assert hits, f"high-copy-family element at {es}-{ee} not found"


def test_scn_roundtrip_and_record_model():
    r = LTRRecord(seq_id="chr1", start=1001, end=5000, lltr=400, rltr=395,
                  similarity=92.5, seq_nr=0)
    assert r.element_len == 4000
    assert r.lltr_e == 1400
    assert r.rltr_s == 4606
    assert r.id == "chr1:1001-5000:1400-4606"
    f = io.StringIO()
    write_scn([r], f)
    f.seek(0)
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".scn", delete=False) as tf:
        tf.write(f.getvalue())
        path = tf.name
    recs = parse_scn(path)
    os.unlink(path)
    assert len(recs) == 1
    assert recs[0].key == r.key
    assert recs[0].similarity == 92.5


def test_estimate_age_jc69():
    r = LTRRecord("c", 1, 1000, 100, 100, similarity=95.0)
    div = 0.05
    expected = (-3 / 4 * math.log(1 - 4 * div / 3)) / (2 * 1.3e-8)
    assert r.estimate_age(mu=1.3e-8) == pytest.approx(expected)
    # saturated divergence
    r2 = LTRRecord("c", 1, 1000, 100, 100, similarity=20.0)
    assert r2.estimate_age(mu=1e-8) == pytest.approx(0.8 / 2e-8)


def test_resolve_overlaps_prefers_completed_then_longer():
    a = LTRRecord("c", 100, 5000, 300, 300, 90.0)
    b = LTRRecord("c", 200, 4000, 300, 300, 91.0)  # overlaps a, shorter
    out = resolve_overlaps([a, b])
    assert out == [a]
    b.completed = "yes"
    out = resolve_overlaps([a, b])
    assert out == [b]
    c = LTRRecord("c", 9000, 12000, 300, 300, 88.0)  # no overlap
    out = resolve_overlaps([a, b, c])
    assert set(r.key for r in out) == {b.key, c.key}


def test_parse_harvest_options():
    p = parse_harvest_options("-seqids yes -similar 85 -minlenltr 120 -maxtsd 8")
    assert p["similar"] == 85.0
    assert p["minlenltr"] == 120
    assert p["maxtsd"] == 8
    assert p["maxlenltr"] == 7000  # default kept


def test_nj_tree_topology():
    # 4 taxa with additive distances; check siblings group together
    names = ["a", "b", "c", "d"]
    d = np.array([
        [0, 2, 9, 9],
        [2, 0, 9, 9],
        [9, 9, 0, 2],
        [9, 9, 2, 0],
    ], dtype=float)
    t = native.nj_tree(d, names)
    assert t.endswith(";")
    # a,b adjacent and c,d adjacent in the newick
    import re
    pairs = re.findall(r"\(([a-d]):[\d.]+,([a-d]):[\d.]+\)", t)
    flat = {frozenset(p) for p in pairs}
    assert frozenset({"a", "b"}) in flat or frozenset({"c", "d"}) in flat


def test_classify_translate():
    from subphaser_tpu.ltr.classify import parse_rexdb_name, six_frames, translate

    assert translate("ATGGCT") == "MA"
    frames = six_frames("ATGGCTAAA")
    assert len(frames) == 6
    o, sf, cl, dom = parse_rexdb_name("Class_I/LTR/Ty1_copia/Ale/RT")
    assert o == "LTR" and sf == "Copia" and cl == "Ale" and dom == "RT"
    o, sf, cl, dom = parse_rexdb_name("Class_I/LTR/Ty3_gypsy/chromovirus/CRM:INT")
    assert sf == "Gypsy" and dom == "INT" and cl == "CRM"


def test_reroot_midpoint():
    from subphaser_tpu.ltr.tree import parse_newick, reroot_midpoint

    # caterpillar tree: diameter path is A..D with length 10; midpoint lies
    # 5 from each end, inside the internal edge
    nwk = "((A:1,B:2):3,(C:2,D:6):1);"
    out = reroot_midpoint(nwk)
    root = parse_newick(out)
    assert len(root.children) == 2

    def leaf_depths(n, d=0.0, acc=None):
        acc = {} if acc is None else acc
        if not n.children:
            acc[n.name] = d + n.length
        for c in n.children:
            leaf_depths(c, d + n.length if n.name or n.children else d, acc)
        return acc

    def depths(n, d0=0.0):
        out_d = {}
        def rec(m, d):
            d2 = d + m.length
            if not m.children:
                out_d[m.name] = d2
            for c in m.children:
                rec(c, d2)
        for c in n.children:
            rec(c, 0.0)
        return out_d

    d = depths(root)
    # diameter is B-D with length 12; after midpoint rooting both
    # endpoints sit exactly 6.0 from the root
    assert abs(d["B"] - 6.0) < 1e-6, d
    assert abs(d["D"] - 6.0) < 1e-6, d
    assert max(d.values()) <= 6.0 + 1e-6, d


def test_domain_tree_grouping(tmp_path):
    """Domain-peptide trees separate two clades and drop domainless
    elements (reference concatenate_domains semantics)."""
    import numpy as np

    from subphaser_tpu.ltr.classify import Classification
    from subphaser_tpu.ltr.tree import build_ltr_trees

    rng = np.random.default_rng(11)
    aas = "ACDEFGHIKLMNPQRSTVWY"

    def rand_pep(n):
        return "".join(rng.choice(list(aas), size=n))

    def mutate_pep(p, rate):
        return "".join(
            rng.choice([c for c in aas if c != ch]) if rng.random() < rate else ch
            for ch in p
        )

    class FakeLTR:
        def __init__(self, id, sg):
            self.id, self.sg = id, sg
            self.superfamily = "Copia"
            self.exchange = "no"
            self.seq_id = "c1"

        def get_full_seq(self, seq):
            return "ACGT" * 300

    base_a, base_b = rand_pep(240), rand_pep(240)
    ltrs, d_class = [], {}
    for i in range(5):
        for sg, base in (("SG1", base_a), ("SG2", base_b)):
            lid = f"{sg}_e{i}"
            l = FakeLTR(lid, sg)
            ltrs.append(l)
            d_class[lid] = Classification(
                id=lid, order="LTR", superfamily="Copia",
                domain_seqs={"INT": mutate_pep(base[:80], 0.05),
                             "RT": mutate_pep(base[80:160], 0.05),
                             "RH": mutate_pep(base[160:], 0.05)},
            )
    # one element with NO domains: must be dropped from the tree
    nod = FakeLTR("SG1_nodom", "SG1")
    ltrs.append(nod)
    d_class["SG1_nodom"] = Classification(id="SG1_nodom", order="LTR",
                                          superfamily="Copia")
    out = build_ltr_trees(
        ltrs, {"c1": "ACGT" * 400}, str(tmp_path / "t"),
        domains=["INT", "RT", "RH"], d_colors={"SG1": "#f00", "SG2": "#00f"},
        figfmt="png", d_class=d_class,
    )
    assert "Copia" in out
    treefile, mapfile = out["Copia"]
    nwk = open(treefile).read()
    assert "SG1_nodom" not in nwk
    # clades separate: the two subtrees under the midpoint root are pure
    from subphaser_tpu.ltr.tree import parse_newick

    root = parse_newick(nwk)
    def leaves(n):
        if not n.children:
            return [n.name]
        return [x for c in n.children for x in leaves(c)]
    sides = [set(leaves(c)) for c in root.children]
    joined = [{"SG1" if "SG1" in x else "SG2" for x in side} for side in sides]
    assert any(len(j) == 1 for j in joined), f"clades mixed: {sides}"


def test_seed_cap_escalation_retry():
    """A repeat-dense tile overflowing seed_cap must retry with more room
    and still find the planted LTR (no silent truncation)."""
    import numpy as np

    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ltr.detect import DEFAULT_PARAMS, detect_ltr_chrom
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(77)
    unit = random_seq(rng, 1200)          # tandem unit inside the LTR window
    ltr = random_seq(rng, 300)
    inner = random_seq(rng, 1500)
    seq = (unit * 40) + ltr + inner + ltr + (unit * 40)
    g = PackedGenome.from_dict({"c": seq})
    prm = dict(DEFAULT_PARAMS)
    recs_small = detect_ltr_chrom(g.chroms[0], prm, tile_bases=1 << 16,
                                  seed_cap=1 << 8)
    recs_big = detect_ltr_chrom(g.chroms[0], prm, tile_bases=1 << 16,
                                seed_cap=1 << 18)
    # retry path must converge to the same candidates as the generous cap
    assert {r.key for r in recs_small} == {r.key for r in recs_big}
    assert recs_big, "planted LTR not detected"


def test_alignment_tree_beats_sketch_on_low_divergence():
    """The alignment-based tree (progressive MSA + Kimura distances + NJ,
    ltr/msa — reference mafft+trimal+FastTree, LTR.py:144-299) recovers the
    true simulated topology where sketch-NJ does not: at low divergence on
    short peptides, 256-hash Jaccard quantization swamps 1-2 residue
    differences while alignment p-distances resolve them."""
    from subphaser_tpu.ltr import msa as msamod
    from subphaser_tpu.ltr.msa import (
        AA,
        nj_with_support,
        progressive_msa,
        trim_alignment,
    )
    from subphaser_tpu.ltr.native import nj_tree
    from subphaser_tpu.ltr.tree import mash_distances

    def evolve(seq, nmut, rng):
        s = list(seq)
        for p in rng.choice(len(s), nmut, replace=False):
            s[p] = AA[rng.integers(0, 20)]
        return "".join(s)

    rng = np.random.default_rng(7)  # seed where the sketch tree fails
    root = "".join(rng.choice(list(AA), 70))
    a, b = evolve(root, 4, rng), evolve(root, 4, rng)
    pairs = [evolve(a, 2, rng), evolve(a, 2, rng),
             evolve(b, 2, rng), evolve(b, 2, rng)]
    names = ["A1", "A2", "A3", "A4", "B1", "B2", "B3", "B4"]
    parents = [pairs[0], pairs[0], pairs[1], pairs[1],
               pairs[2], pairs[2], pairs[3], pairs[3]]
    peps = [evolve(p, 1, rng) for p in parents]

    def canon(bps):
        out = set()
        for s in bps:
            comp = frozenset(set(names) - s)
            out.add(min(s, comp, key=lambda x: sorted(x)))
        return out

    true_c = canon({
        frozenset(x) for x in
        [("A1", "A2"), ("A3", "A4"), ("B1", "B2"), ("B3", "B4"),
         ("A1", "A2", "A3", "A4")]
    })

    aln = progressive_msa(peps)
    trimmed, _ = trim_alignment(aln)
    nwk_aln = nj_with_support(trimmed, names, n_boot=25, seed=0)
    aln_c = canon(msamod._bipartitions(nwk_aln))
    assert true_c <= aln_c, f"alignment tree missed: {true_c - aln_c}"

    # peptide 5-mer minhash sketches (the pre-round-3 approach)
    def pep_sketch(p, k=5, s=256):
        idx = msamod.encode_peptides([p])[0].astype(np.int64)
        n = idx.size - k + 1
        code = np.zeros(n, dtype=np.int64)
        for j in range(k):
            code = code * 20 + idx[j : j + n]
        h = code.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        return np.unique(h)[:s]

    nwk_sk = nj_tree(mash_distances([pep_sketch(p) for p in peps], k=5), names)
    sk_c = canon(msamod._bipartitions(nwk_sk))
    assert not (true_c <= sk_c), "sketch tree unexpectedly perfect"

    # bootstrap supports present on the alignment tree's internal nodes
    import re

    assert re.search(r"\)\d+:", nwk_aln), nwk_aln


def test_detection_checkpoint_parts(tmp_path):
    """Per-chromosome detection checkpointing (wheat-scale crash
    insurance): a part file written for a finished chromosome is honored
    on resume — even a DIFFERENT (tampered) part must be returned as-is,
    proving detection was skipped — and the merged result equals a fresh
    detection when parts match."""
    rng = np.random.default_rng(3)
    block, _tsd, _el = None, None, None
    ltr = "TG" + random_seq(rng, 396) + "CA"
    elem = ltr + random_seq(rng, 3000) + _mutate(rng, ltr, 0.03)
    tsd = "GATCA"
    seq = random_seq(rng, 9000) + tsd + elem + tsd + random_seq(rng, 9000)
    g = PackedGenome.from_dict({"c1": seq, "c2": random_seq(rng, 20000)})
    prefix = str(tmp_path / "LTR.scn")

    fresh = detect_ltr(g, tile_bases=1 << 15)
    first = detect_ltr(g, tile_bases=1 << 15, checkpoint_prefix=prefix)
    assert [r.key for r in first] == [r.key for r in fresh]
    import os

    assert os.path.exists(prefix + ".part.c1.scn")
    assert os.path.exists(prefix + ".part.c2.scn")

    # tamper with c1's part: resume must trust the checkpoint, not re-run
    from subphaser_tpu.ltr.records import parse_scn, write_scn

    recs = parse_scn(prefix + ".part.c1.scn")
    kept = recs[:0]  # empty
    with open(prefix + ".part.c1.scn", "w") as f:
        write_scn(kept, f)
    resumed = detect_ltr(g, tile_bases=1 << 15, checkpoint_prefix=prefix)
    c1 = [r for r in resumed if r.seq_id == "c1"]
    assert c1 == [], "tampered part ignored: detection re-ran instead of resuming"
