"""Homoeologous block alignment + PAF model tests."""

import numpy as np
import pytest

from subphaser_tpu.blocks.paf import PafRecord, best_hit, parse_paf, primary_blocks
from subphaser_tpu.io.genome import PackedGenome
from tests.test_encoding import random_seq


def _mutate(rng, s, rate):
    out = []
    for ch in s:
        if rng.random() < rate:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        else:
            out.append(ch)
    return "".join(out)


def revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


@pytest.fixture(scope="module")
def homoeologs():
    rng = np.random.default_rng(0)
    anc = random_seq(rng, 120_000)
    a = _mutate(rng, anc, 0.05)
    b = _mutate(rng, anc, 0.05)
    unrelated = random_seq(rng, 120_000)
    return PackedGenome.from_dict({"qa": a, "tb": b, "un": unrelated}), rng


def test_align_homoeolog_pair(homoeologs):
    from subphaser_tpu.blocks.align import align_pair

    genome, _ = homoeologs
    recs = align_pair(genome, "qa", "tb", min_block=10_000)
    assert recs, "no blocks found between homoeologs"
    total = sum(r.qspan for r in recs)
    assert total > 80_000, f"only {total} bp covered"
    assert all(r.strand == "+" for r in recs)
    # coordinates roughly diagonal (same ancestor, no rearrangement)
    for r in recs:
        assert abs(r.qstart - r.tstart) < 5_000


def test_align_unrelated_pair_empty(homoeologs):
    from subphaser_tpu.blocks.align import align_pair

    genome, _ = homoeologs
    recs = align_pair(genome, "qa", "un", min_block=10_000)
    assert len(recs) == 0


def test_align_inverted_segment():
    from subphaser_tpu.blocks.align import align_pair

    rng = np.random.default_rng(3)
    anc = random_seq(rng, 60_000)
    seg = random_seq(rng, 40_000)
    a = anc + seg
    b = _mutate(rng, anc, 0.03) + revcomp(_mutate(rng, seg, 0.03))
    genome = PackedGenome.from_dict({"q": a, "t": b})
    recs = align_pair(genome, "q", "t", min_block=10_000)
    strands = {r.strand for r in recs}
    assert strands == {"+", "-"}
    minus = [r for r in recs if r.strand == "-"][0]
    assert minus.qstart >= 55_000  # inverted segment is the tail
    assert minus.tstart >= 55_000


def test_paf_roundtrip(tmp_path):
    rec = PafRecord("q", 1000, 10, 900, "+", "t", 2000, 100, 990, 800, 890, 60,
                    tags={"tp": "P", "cm": 42})
    line = rec.to_line()
    back = PafRecord.parse(line)
    assert back.qname == "q" and back.tags["cm"] == 42 and back.is_primary
    p = tmp_path / "x.paf"
    p.write_text(line + "\n" + line.replace("tp:A:P", "tp:A:S") + "\n")
    assert len(list(parse_paf(str(p)))) == 2
    prim = list(primary_blocks(str(p), min_block=500))
    assert len(prim) == 1


def test_circos_plot_smoke(tmp_path):
    from subphaser_tpu.viz.circos import circos_plot

    rng = np.random.default_rng(0)
    sizes = {"A1": 100_000, "B1": 100_000}
    d_sg = {"A1": "SG1", "B1": "SG2"}
    colors = {"SG1": "#e41a1c", "SG2": "#377eb8"}
    bins = {
        n: rng.integers(0, 20, size=(10, 2)).astype(np.int64) for n in sizes
    }
    out = str(tmp_path / "circos.png")
    circos_plot(
        sizes, d_sg, ["SG1", "SG2"], colors, bins, bin_size=10_000,
        window_size=20_000, outfig=out,
        enrich_lines=[["A1", 0, 20_000, "SG1"], ["B1", 0, 20_000, "SG2"]],
        ltr_bedlines=[["A1", 5_000, 9_000, "x"]],
        legend_file=str(tmp_path / "legend.txt"),
    )
    import os

    assert os.path.getsize(out) > 10_000
    assert "Karyotype" in (tmp_path / "legend.txt").read_text()


def test_circos_ratio_and_density_minus_rings(tmp_path):
    """The SG-ratio ring (reference Circos.py:493-505) and the LTR
    density-minus-enriched ring (Circos.py:684-707) render and are named
    in the legend."""
    from subphaser_tpu.viz.circos import circos_plot

    rng = np.random.default_rng(1)
    sizes = {"A1": 100_000, "B1": 100_000}
    d_sg = {"A1": "SG1", "B1": "SG2"}
    colors = {"SG1": "#e41a1c", "SG2": "#377eb8"}
    bins = {
        n: rng.integers(0, 20, size=(10, 2)).astype(np.int64) for n in sizes
    }
    # full-width enrich_bin rows: [chrom, start, end, key, pval, counts,
    # ratios, enrich, pvals, potential_exchange]
    enrich_lines = [
        ["A1", 0, 20_000, "SG1", 1e-4, "10,1", "0.9,0.1", "1,0,0", "1e-4,0.9", "no"],
        ["B1", 0, 20_000, "SG2", 1e-3, "2,8", "0.2,0.8", "0,1,0", "0.9,1e-3", "no"],
        ["B1", 20_000, 40_000, None, 0.5, "3,3", "nan,nan", "0,0,1", "0.5,0.5", "none"],
    ]
    ltr_bed = [["A1", 5_000, 9_000, "x"], ["A1", 6_000, 9_500, "y"],
               ["B1", 25_000, 29_000, "z"]]
    enrich_ltr = [[["A1", 5_000, 9_000, "x"]], [["B1", 25_000, 29_000, "z"]]]
    out = str(tmp_path / "circos.png")
    out_plain = str(tmp_path / "circos_plain.png")
    circos_plot(
        sizes, d_sg, ["SG1", "SG2"], colors, bins, bin_size=10_000,
        window_size=20_000, outfig=out, enrich_lines=enrich_lines,
        ltr_bedlines=ltr_bed, enrich_ltr_bedlines=enrich_ltr,
        legend_file=str(tmp_path / "legend.txt"),
    )
    # same figure without the new data: must differ (rings actually drew)
    circos_plot(
        sizes, d_sg, ["SG1", "SG2"], colors, bins, bin_size=10_000,
        window_size=20_000, outfig=out_plain,
        enrich_lines=[l[:4] for l in enrich_lines], ltr_bedlines=ltr_bed,
    )
    import os

    assert os.path.getsize(out) > 10_000
    legend = (tmp_path / "legend.txt").read_text()
    assert "Normalized proportion" in legend
    assert "SG-enriched LTRs" in legend
    assert open(out, "rb").read() != open(out_plain, "rb").read()


def test_paf_cs_calls_and_best_hit():
    line = ("q\t100\t0\t10\t+\tt\t200\t50\t61\t9\t11\t60\ttp:A:P\t"
            "cs:Z::4*at-gg:2+tt:2")
    rec = PafRecord.parse(line)
    ops = rec.cs_ops()
    assert ops == [(":", 4), ("*", "at"), ("-", "gg"), (":", 2), ("+", "tt"), (":", 2)]
    calls = rec.cs_calls()
    # tstart=50: match 4 -> sub at 54, del at 55 (GG), ins after 57+2
    assert calls[0] == (54, "A", "T")
    assert calls[1] == (55, "GG", "")
    assert calls[2] == (57 + 2, "", "TT")
    assert rec.qcov() == pytest.approx(0.1)

    sec = PafRecord.parse(line.replace("tp:A:P", "tp:A:S"))
    sec.nmatch = 99
    best = best_hit([sec, rec])
    assert best["q"] is rec  # primary beats higher nmatch secondary


def test_paf_overlap_contains():
    a = PafRecord("q", 1000, 100, 500, "+", "t", 2000, 0, 400, 300, 400, 60)
    b = PafRecord("q", 1000, 200, 300, "+", "t", 2000, 350, 450, 90, 100, 60)
    assert a.qoverlap(b) == 100
    assert a.toverlap(b) == 50
    assert a.qcontains(b)
    assert not b.qcontains(a)


def test_cs_emission_plus_strand():
    """Native aligner emits a valid cs:Z: string whose variant calls
    recover planted SNPs and indels (minimap2 --cs equivalent)."""
    import numpy as np

    from subphaser_tpu.blocks.align import align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(21)
    base = random_seq(rng, 60_000)
    # target = base; query = base with 3 SNPs, one 5 bp deletion (absent
    # from query), one 4 bp insertion
    q = list(base)
    snp_pos = [10_007, 25_001, 40_003]
    for p in snp_pos:
        q[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[q[p]]
    del_pos, ins_pos = 18_000, 33_000
    q = q[:del_pos] + q[del_pos + 5 :]
    ins_seq = "ACGTA"[:4]
    q2 = "".join(q)
    q2 = q2[:ins_pos] + ins_seq + q2[ins_pos:]
    g = PackedGenome.from_dict({"q": q2, "t": base})
    recs = align_pair(g, "q", "t", min_block=10_000, min_anchors=5)
    assert recs, "no block found"
    r = max(recs, key=lambda r: r.alen)
    assert "cs" in r.tags
    calls = r.cs_calls()
    subs = [(p, ref, alt) for p, ref, alt in calls if ref and alt]
    dels = [(p, ref, alt) for p, ref, alt in calls if ref and not alt]
    ins = [(p, ref, alt) for p, ref, alt in calls if alt and not ref]
    got_sub_pos = {p for p, *_ in subs}
    for p in snp_pos:
        assert p in got_sub_pos, f"SNP at {p} missed: {sorted(got_sub_pos)[:5]}"
    assert any(abs(p - del_pos) <= 8 and len(ref) == 5 for p, ref, _ in dels), dels
    assert any(abs(p - del_pos) <= 8 for p, _, alt in ins
               for _ in [0] if len(alt) == 4) or any(
        len(alt) == 4 for _, _, alt in ins), ins
    # identity bookkeeping: nmatch/alen consistent with cs
    ops = r.cs_ops()
    nmatch = sum(v for op, v in ops if op == ":")
    assert r.nmatch == nmatch


def test_cs_emission_minus_strand():
    """Minus-strand cs walks the target forward with reverse-complemented
    query bases (minimap2 layout, consumed by the reference's CsBlocks)."""
    import numpy as np

    from subphaser_tpu.blocks.align import align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(22)
    base = random_seq(rng, 50_000)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    q = "".join(comp[c] for c in reversed(base))
    # one SNP in query coordinates
    qlist = list(q)
    qlist[20_000] = {"A": "C", "C": "G", "G": "T", "T": "A"}[qlist[20_000]]
    q = "".join(qlist)
    g = PackedGenome.from_dict({"q": q, "t": base})
    recs = align_pair(g, "q", "t", min_block=10_000, min_anchors=5)
    minus = [r for r in recs if r.strand == "-"]
    assert minus, "no minus-strand block"
    r = max(minus, key=lambda r: r.alen)
    calls = r.cs_calls()
    subs = [(p, ref, alt) for p, ref, alt in calls if ref and alt]
    assert len(subs) >= 1
    # the SNP at query position 20000 maps to target position
    # len(q) - 1 - 20000; ref base must equal the target's base there
    tpos_expect = len(base) - 1 - 20_000
    hit = [s for s in subs if abs(s[0] - tpos_expect) <= 1]
    assert hit, (subs[:5], tpos_expect)
    assert hit[0][1] == base[hit[0][0]].upper()
    assert hit[0][2] == comp[q[20_000]].upper()


def test_build_cs_native_matches_python():
    """sp_build_cs must emit exactly the Python cs-builder's text (both
    orientations), including substitutions, indels, DP'd gaps, N handling."""
    import numpy as np

    from subphaser_tpu.blocks import cs as csmod
    from subphaser_tpu.ltr.native import build_cs_native

    rng = np.random.default_rng(23)
    k = 7
    for trial in range(8):
        n = int(rng.integers(300, 1200))
        q = rng.integers(0, 4, n).astype(np.uint8)
        # target = query with noise: substitutions, a deletion, an insertion, Ns
        t = q.copy()
        sub = rng.random(n) < 0.05
        t[sub] = (t[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
        t[rng.integers(0, n, 3)] = 4  # N
        cut = int(rng.integers(50, n - 60))
        t = np.concatenate([t[:cut], t[cut + 5 :]])  # 5-bp deletion in t
        ins = int(rng.integers(30, 40))
        t = np.concatenate([t[:ins], rng.integers(0, 4, 4).astype(np.uint8), t[ins:]])
        # anchors: exact k-mer matches on a sampled grid
        aq, at = [], []
        off = 0
        for x in range(0, min(len(q), len(t)) - k, 37):
            y = x + (4 if x >= ins else 0) - (5 if x >= cut + 4 else 0)
            if 0 <= y <= len(t) - k and np.array_equal(q[x : x + k], t[y : y + k]):
                aq.append(x)
                at.append(y)
        if len(aq) < 3:
            continue
        aq = np.array(aq, dtype=np.int64)
        at = np.array(at, dtype=np.int64)
        qs, qe = int(aq[0]), int(aq[-1]) + k
        ts, te = int(at[0]), int(at[-1]) + k
        for minus in (False, True):
            ops = csmod.build_cs(q, t, aq, at, qs, qe, ts, te, k)
            if minus:
                ops = csmod.minus_transform(ops)
            want = csmod.format_cs(ops)
            want_nmatch = sum(v for key, v in ops if key == ":")
            want_alen = want_nmatch + sum(
                1 if key == "*" else len(v) for key, v in ops if key in "*+-"
            )
            got, nmatch, alen = build_cs_native(
                q, t, aq, at, qs, qe, ts, te, k, minus=minus
            )
            assert got == want, f"trial {trial} minus={minus}"
            assert nmatch == want_nmatch and alen == want_alen


def test_anchor_cap_escalation_retry():
    """chrom_anchors must escalate its per-tile cap (not truncate) when the
    sampled-anchor density blows past the estimate."""
    import numpy as np

    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.io.encoding import code_to_kmer
    from subphaser_tpu.ops.anchors import chrom_anchors

    # a k-mer whose CANONICAL code is 0 mod 16 at every position: poly-A
    # (code 0); every position samples -> n_total = n_pos >> base_cap
    n = 1 << 16
    g = PackedGenome.from_dict({"c": "A" * (n + 64)})
    qc, qp, qs = chrom_anchors(g.chroms[0], k=15, mod=16, tile_bases=n)
    assert qc.size >= n  # all positions kept (cap escalated, not truncated)
    assert np.all(qc == 0)
    assert code_to_kmer(0, 15) == "A" * 15


def test_build_cs_native_overlapping_anchors():
    """Anchors overlapping the previous one must be skipped identically in
    the native and Python builders (the x < cq / y < ct branch)."""
    import numpy as np

    from subphaser_tpu.blocks import cs as csmod
    from subphaser_tpu.ltr.native import build_cs_native

    rng = np.random.default_rng(31)
    k = 9
    q = rng.integers(0, 4, 600).astype(np.uint8)
    t = q.copy()
    t[100] = (t[100] + 1) % 4
    # dense anchors every 3 bp -> most overlap the previous k-mer
    aq = np.arange(10, 580, 3, dtype=np.int64)
    at = aq.copy()
    ok = np.array([np.array_equal(q[x:x+k], t[x:x+k]) for x in aq])
    aq, at = aq[ok], at[ok]
    qs, qe = int(aq[0]), int(aq[-1]) + k
    ops = csmod.build_cs(q, t, aq, at, qs, qe, qs, qe, k)
    want = csmod.format_cs(ops)
    got, _, _ = build_cs_native(q, t, aq, at, qs, qe, qs, qe, k)
    assert got == want


def test_device_match_equals_host_match():
    """match_anchors_dev (device join, only matches downloaded) yields the
    SAME pair set as the host match_anchors, in (q, t)-sorted order."""
    import numpy as np

    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ops.anchors import (
        chrom_anchors,
        chrom_anchors_dev,
        match_anchors,
        match_anchors_dev,
    )
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(21)
    core = random_seq(rng, 40_000)
    rep = random_seq(rng, 700)
    qseq = core[:20_000] + rep + core[20_000:] + rep
    tseq = rep + core[5_000:35_000] + rep + rep  # high-occ repeat too
    g = PackedGenome.from_dict({"q": qseq, "t": tseq})
    k, mod, tb = 13, 4, 1 << 14

    qc, qp, qs = chrom_anchors(g.chrom("q"), k=k, mod=mod, tile_bases=tb)
    tc, tp, ts = chrom_anchors(g.chrom("t"), k=k, mod=mod, tile_bases=tb)
    hq, ht, hr = match_anchors(qc, qp, qs, tc, tp, ts)
    order = np.lexsort((ht, hq))
    host = set(zip(hq[order], ht[order], hr[order]))

    qa = chrom_anchors_dev(g.chrom("q"), k=k, mod=mod, tile_bases=tb)
    ta = chrom_anchors_dev(g.chrom("t"), k=k, mod=mod, tile_bases=tb)
    dq, dt, dr = match_anchors_dev(qa, ta)
    dev = set(zip(dq, dt, dr))
    assert dev == host
    # device output is (q, t)-sorted
    assert np.all(np.diff(dq) >= 0)


def test_align_pair_device_match_paf(tmp_path):
    """align_pair (device anchor join) still produces a valid block with a
    cs string spanning the declared coordinates on a divergent pair."""
    import numpy as np

    from subphaser_tpu.blocks.align import align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(8)
    anc = random_seq(rng, 120_000)
    qseq = anc
    t_list = list(anc)
    for p in rng.choice(len(t_list), 2000, replace=False):
        t_list[p] = "ACGT"[rng.integers(0, 4)]
    tseq = "".join(t_list)
    g = PackedGenome.from_dict({"q": qseq, "t": tseq})
    recs = align_pair(g, "q", "t", k=13, mod=4, min_block=20_000)
    assert recs, "no block found on a 98.3%-identical pair"
    r = recs[0]
    # cs must walk exactly qstart..qend / tstart..tend
    import re

    qlen = tlen = 0
    for op, val in re.findall(r"([:*+-])([A-Za-z0-9]+)", r.tags["cs"]):
        if op == ":":
            qlen += int(val); tlen += int(val)
        elif op == "*":
            qlen += 1; tlen += 1
        elif op == "+":
            qlen += len(val)
        else:
            tlen += len(val)
    assert qlen == r.qend - r.qstart
    assert tlen == r.tend - r.tstart
