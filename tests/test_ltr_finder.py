"""Finder-style LTR detector: chain candidates + structural signal gating.

The second detector (reference runs `ltr_finder` alongside LTRharvest and
merges, LTR.py:33-61; record columns TSR/PBS/PPT/strand/score at
LTR.py:715-725). Tests plant elements with/without the structural signals
and check detection, scoring, strand inference, and indel-drift chaining.
"""

import numpy as np

from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ltr.detect import (
    detect_finder_chrom,
    detect_ltr,
    parse_finder_options,
)
from tests.test_encoding import random_seq
from tests.test_ltr import _mutate

PBS = "TGGTATCAGAGC"          # tRNA-iMet primer-binding site motif
PPT = "AGGGAGGAAAGAGGGAA"     # polypurine tract (17 purines)


def _revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def make_full_element(rng, ltr_len=400, internal_len=3000, div=0.03,
                      tsd="ACGTC", minus=False):
    """Element with every structural signal: TG..CA LTR termini, TSD, PBS
    just inside the left LTR, PPT just before the right LTR."""
    core = "TG" + random_seq(rng, ltr_len - 4) + "CA"
    internal = random_seq(rng, internal_len)
    inner = PBS + internal[len(PBS) : internal_len - len(PPT) - 3] \
        + PPT + internal[internal_len - 3 :]
    element = core + inner + _mutate(rng, core, div)
    if minus:
        element = _revcomp(element)
    return tsd + element + tsd, len(tsd), len(element)


def _detect(seq, **kw):
    g = PackedGenome.from_dict({"c1": seq})
    params = parse_finder_options(kw.pop("options", None))
    return detect_finder_chrom(g.chroms[0], params, **kw)


def test_full_signal_element_scores_four():
    rng = np.random.default_rng(7)
    block, tsd_len, elem_len = make_full_element(rng)
    seq = random_seq(rng, 9000) + block + random_seq(rng, 9000)
    es = 9000 + tsd_len
    recs = _detect(seq, tile_bases=1 << 15)
    hits = [r for r in recs
            if abs(r.start - 1 - es) <= 10 and abs(r.end - (es + elem_len)) <= 10]
    assert hits, f"full-signal element at {es} not found: {recs}"
    r = hits[0]
    assert r.score == 4
    assert r.motifs == "TGCA,TSD,PBS,PPT"
    assert r.strand == "+"
    assert r.tsd_len == 5
    assert 380 <= r.lltr <= 420


def test_minus_strand_inference():
    rng = np.random.default_rng(8)
    block, tsd_len, elem_len = make_full_element(rng, minus=True)
    seq = random_seq(rng, 9000) + block + random_seq(rng, 9000)
    es = 9000 + tsd_len
    recs = _detect(seq, tile_bases=1 << 15)
    hits = [r for r in recs if abs(r.start - 1 - es) <= 10]
    assert hits
    # PBS/PPT now sit in reverse-complement orientation -> minus strand
    assert hits[0].strand == "-"
    assert "PBS" in (hits[0].motifs or "") or "PPT" in (hits[0].motifs or "")


def test_score_gate_rejects_bare_repeats():
    """A plain direct repeat with no TG..CA, no TSD, no PBS/PPT must fail
    the default min_score=2 structural gate but pass -min_score 0 (the
    gate's extension token; ltr_finder's -w is an output-format flag and
    is ignored — see parse_finder_options)."""
    rng = np.random.default_rng(9)
    ltr = "AC" + random_seq(rng, 396) + "GT"   # termini that are not TG/CA
    elem = ltr + random_seq(rng, 3000) + _mutate(rng, ltr, 0.03)
    # no TSD: flanks are unrelated
    seq = random_seq(rng, 9000) + elem + random_seq(rng, 9000)
    strict = _detect(seq, tile_bases=1 << 15)
    hits = [r for r in strict if abs(r.start - 1 - 9000) <= 30]
    assert not hits, f"bare repeat passed min_score 2: {hits}"
    loose = _detect(seq, tile_bases=1 << 15, options="-min_score 0")
    hits0 = [r for r in loose if abs(r.start - 1 - 9000) <= 30]
    assert hits0
    assert hits0[0].score <= 1


def test_chains_across_indel_drift():
    """A 120 bp insertion inside the right LTR shifts its seed diagonals far
    beyond the harvest detector's cluster band; colinear chaining must still
    yield ONE candidate spanning the whole LTR pair."""
    rng = np.random.default_rng(10)
    half_a = "TG" + random_seq(rng, 300)
    half_b = random_seq(rng, 300) + "CA"
    left = half_a + half_b
    right = _mutate(rng, half_a, 0.02) + random_seq(rng, 120) \
        + _mutate(rng, half_b, 0.02)
    tsd = "GATCA"
    elem = left + PBS + random_seq(rng, 2500) + PPT + right
    seq = random_seq(rng, 9000) + tsd + elem + tsd + random_seq(rng, 9000)
    recs = _detect(seq, tile_bases=1 << 15)
    es = 9000 + len(tsd)
    hits = [r for r in recs if abs(r.start - 1 - es) <= 15
            and abs(r.end - (es + len(elem))) <= 15]
    assert hits, f"drifted element not chained: {recs}"
    # right LTR carries the insertion: lengths differ by ~120
    assert abs(hits[0].rltr - hits[0].lltr - 120) <= 30


def test_parse_finder_options_w_and_M():
    p = parse_finder_options(
        "-w 2 -min_score 3 -D 12000 -d 800 -L 5000 -l 150 -M 0.85")
    # -w is ltr_finder's OUTPUT FORMAT flag, not a threshold: ignored
    assert p["min_score"] == 3
    assert p["maxdistltr"] == 12000
    assert p["mindistltr"] == 800
    assert p["maxlenltr"] == 5000
    assert p["minlenltr"] == 150
    assert p["similar"] == 85.0
    assert parse_finder_options(None)["min_score"] == 2


def test_detect_ltr_merges_both_detectors():
    rng = np.random.default_rng(11)
    block, tsd_len, elem_len = make_full_element(rng)
    seq = random_seq(rng, 9000) + block + random_seq(rng, 9000)
    g = PackedGenome.from_dict({"c1": seq})
    both = detect_ltr(g, detectors=["ltr_harvest", "ltr_finder"],
                      tile_bases=1 << 15)
    es = 9000 + tsd_len
    hits = [r for r in both if abs(r.start - 1 - es) <= 10]
    assert hits
    # finder-only run yields records carrying score/motifs
    finder = detect_ltr(g, detectors=["ltr_finder"], tile_bases=1 << 15)
    assert any(r.score is not None for r in finder)
