"""Parity tests that drive the REFERENCE'S OWN CODE as the oracle.

Everything else in the suite checks our implementations against
re-derivations of the reference math; these tests import the actual
reference modules from /root/reference (read-only) and compare outputs on
shared random inputs. The reference's unavailable leaf deps (the `fisher`
C extension, statsmodels, Bio, xopen) are stubbed with scipy/builtins
equivalents — the logic under test (filter gates, enrichment gates,
clamp order, ratio/NaN semantics) is all reference code.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "subphaser")),
    reason="reference checkout not present",
)


def _install_stubs():
    """Stub the reference's unavailable leaf imports (scipy-backed)."""
    import scipy.stats as sps

    if "fisher" not in sys.modules:
        fisher = types.ModuleType("fisher")

        class _PV:
            __slots__ = ("right_tail",)

            def __init__(self, right_tail):
                self.right_tail = right_tail

        def pvalue(a, b, c, d):
            # independent exact path (scipy's own fisher_exact machinery)
            p = sps.fisher_exact([[a, b], [c, d]], alternative="greater")[1]
            return _PV(float(p))

        fisher.pvalue = pvalue
        sys.modules["fisher"] = fisher

    if "statsmodels" not in sys.modules:
        sm = types.ModuleType("statsmodels")
        sm_stats = types.ModuleType("statsmodels.stats")
        sm_mt = types.ModuleType("statsmodels.stats.multitest")

        def multipletests(pvals, method="fdr_bh", alpha=0.05):
            assert method == "fdr_bh"
            adj = sps.false_discovery_control(np.asarray(pvals), method="bh")
            return adj <= alpha, adj, None, None

        sm_mt.multipletests = multipletests
        sm_stats.multitest = sm_mt
        sm.stats = sm_stats
        sys.modules["statsmodels"] = sm
        sys.modules["statsmodels.stats"] = sm_stats
        sys.modules["statsmodels.stats.multitest"] = sm_mt

    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        bio_seq = types.ModuleType("Bio.Seq")
        _COMP = str.maketrans("ACGTacgt", "TGCAtgca")

        class Seq(str):
            def reverse_complement(self):
                return Seq(self.translate(_COMP)[::-1])

        bio_seq.Seq = Seq
        bio_seqio = types.ModuleType("Bio.SeqIO")
        bio.Seq = bio_seq
        bio.SeqIO = bio_seqio
        sys.modules["Bio"] = bio
        sys.modules["Bio.Seq"] = bio_seq
        sys.modules["Bio.SeqIO"] = bio_seqio

    if "xopen" not in sys.modules:
        xo = types.ModuleType("xopen")
        xo.xopen = open
        sys.modules["xopen"] = xo

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    from subphaser import Jellyfish as ref_jellyfish  # noqa: E402
    from subphaser import Stats as ref_stats  # noqa: E402

    return types.SimpleNamespace(stats=ref_stats, jellyfish=ref_jellyfish)


def _random_counts(rng, rows, cols, big_col=None):
    counts = rng.integers(0, 2000, size=(rows, cols)).astype(np.int64)
    counts[rng.random((rows, cols)) < 0.3] = 0
    if big_col is not None:
        # push one column's total past MAX_INT//10 to exercise clamp order
        counts[:, big_col] += 300_000_000 // rows
    return counts


def test_fisher_test_parity_small(ref):
    from subphaser_tpu.ops.stats_host import fisher_enrich_pvals

    rng = np.random.default_rng(0)
    counts = _random_counts(rng, 40, 4)
    ours = fisher_enrich_pvals(counts)
    total = [int(t) for t in counts.sum(axis=0)]
    for r in range(counts.shape[0]):
        theirs = ref.stats.fisher_test([int(v) for v in counts[r]], total)
        np.testing.assert_allclose(ours[r], theirs, rtol=1e-9, atol=1e-300)


def test_fisher_test_parity_clamped(ref):
    """Column totals beyond MAX_INT//10: the clamp-order fix (ADVICE r1)."""
    from subphaser_tpu.ops.stats_host import fisher_enrich_pvals

    rng = np.random.default_rng(1)
    counts = _random_counts(rng, 12, 3, big_col=1)
    assert counts.sum(axis=0).max() > ref.stats.MAX_INT
    ours = fisher_enrich_pvals(counts)
    total = [int(t) for t in counts.sum(axis=0)]
    for r in range(counts.shape[0]):
        theirs = ref.stats.fisher_test([int(v) for v in counts[r]], total)
        np.testing.assert_allclose(ours[r], theirs, rtol=1e-9)


@pytest.mark.parametrize("seed,min_ratio", [(2, 0.5), (3, 0.9)])
def test_enrich_parity(ref, seed, min_ratio):
    """Reference Stats.enrich (sig/key/pval/enrich one-hot) row-by-row."""
    from subphaser_tpu.phase.enrich import enrich_rows

    rng = np.random.default_rng(seed)
    rows, sgs = 60, 3
    counts = rng.integers(0, 300, size=(rows, sgs)).astype(np.int64)
    # plant clearly-enriched rows and all-zero-ish rows
    counts[: rows // 3, 0] += 2000
    counts[rows // 3 : rows // 2, 2] += 50
    colnames = [f"SG{i+1}" for i in range(sgs)]
    rownames = [f"row{r}" for r in range(rows)]

    theirs = list(
        ref.stats.enrich(
            [list(map(int, row)) for row in counts],
            colnames=colnames,
            rownames=rownames,
            ncpu=1,
            min_ratio=min_ratio,
            max_pval=0.05,
        )
    )
    ours = enrich_rows(
        counts, colnames, rownames, max_pval=0.05, min_ratio=min_ratio
    )
    assert len(theirs) == len(ours)
    for t, o in zip(theirs, ours):
        assert bool(t.sig) == o.sig, (t.rowname, t.pval, o.pval)
        assert (t.key if t.sig else None) == o.key
        np.testing.assert_allclose(o.pval, t.pval, rtol=1e-8, atol=1e-300)
        np.testing.assert_array_equal(o.enrich, t.enrich)
        np.testing.assert_allclose(o.ratios, np.asarray(t.ratios), rtol=1e-12)


@pytest.mark.parametrize(
    "seed,by_count,baseline,min_fold,ratio",
    [
        (4, False, 1, 2.0, 1.0),
        (5, False, -1, 2.0, 0.5),
        (6, True, 1, 1.5, 1.0),
        (7, False, 1, 100.0, 1.0),  # nothing passes
    ],
)
def test_filter_kmer_parity(ref, seed, by_count, baseline, min_fold, ratio):
    """Reference Jellyfish._filter_kmer keep/drop decisions per k-mer."""
    from subphaser_tpu.ops.filter import fold_votes_host, make_group_spec

    rng = np.random.default_rng(seed)
    labels = ["A1", "B1", "A2", "B2", "C2", "X"]
    # two homoeologous sets (the second with a comma group) + a singleton
    sgs = [
        [["A1"], ["B1"]],
        [["A2"], ["B2", "C2"]],
        [["X"]],
    ]
    li = {c: i for i, c in enumerate(labels)}
    sg_indices = [[[li[c] for c in grp] for grp in s] for s in sgs]
    spec = make_group_spec(sg_indices, len(labels))

    n = 150
    counts = rng.integers(0, 60, size=(n, len(labels))).astype(np.int64)
    counts[rng.random((n, len(labels))) < 0.4] = 0
    lengths = rng.integers(10_000, 20_000, size=len(labels)).astype(np.int64)
    d_lens = dict(zip(labels, [int(v) for v in lengths]))
    min_freq, max_freq = 20, 250

    theirs = []
    for r in range(n):
        out = ref.jellyfish._filter_kmer(
            (
                f"km{r}",
                [int(v) for v in counts[r]],
                d_lens,
                sgs,
                False,  # outfig
                by_count,
                min_freq,
                max_freq,
                min_fold,
                baseline,
                ratio,
            )
        )
        theirs.append(out[1] is not False)
    fmask = fold_votes_host(
        counts,
        lengths,
        spec,
        min_fold=min_fold,
        ratio=ratio,
        baseline=baseline,
        by_count=by_count,
    )
    tot = counts.sum(axis=1)
    ours = fmask & (tot >= min_freq) & (tot <= max_freq)
    np.testing.assert_array_equal(ours, np.array(theirs))
    assert 0 < n  # sanity: parametrizations with no survivors still compare


@pytest.mark.parametrize("orient", ["forward", "revcomp"])
def test_emitted_cs_consumed_by_reference_paf(ref, orient):
    """The native aligner's PAF + cs:Z: output must parse cleanly through
    the REFERENCE's own consumer (Paf.py PafRecord.parse_cs/CsBlocks,
    reference Paf.py:155-293) with exact per-block coordinates and carried
    sequences — including the minus-strand target-forward layout."""
    from subphaser import Paf as ref_paf  # noqa: E402

    from subphaser_tpu.blocks.align import align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(41 if orient == "forward" else 42)
    qseq = random_seq(rng, 30_000)
    # homoeolog: substitutions + one deletion + one insertion
    t = list(qseq)
    for i in rng.integers(0, len(t), 200):
        t[i] = "ACGT"[rng.integers(0, 4)]
    del t[12_000:12_035]
    t[5_000:5_000] = list(random_seq(rng, 21))
    tseq = "".join(t)
    if orient == "revcomp":
        from tests.oracle import revcomp

        tseq = revcomp(tseq)
    g = PackedGenome.from_dict({"q": qseq, "t": tseq})
    recs = align_pair(g, "q", "t", min_block=5_000, min_anchors=5)
    assert recs, "no blocks found"
    want_strand = "+" if orient == "forward" else "-"
    assert {r.strand for r in recs} == {want_strand}

    comp = str.maketrans("acgt", "tgca")
    for r in recs:
        pr = ref_paf.PafRecord(r.to_line())
        assert pr.cs == r.tags["cs"]
        blocks = list(pr.parse_cs())
        assert blocks[0].tstart == pr.tstart
        assert blocks[-1].tend == pr.tend
        if pr.strand == "+":
            assert blocks[0].qstart == pr.qstart
            assert blocks[-1].qend == pr.qend
        else:
            assert blocks[0].qend == pr.qend
            assert blocks[-1].qstart == pr.qstart
        nmatch = 0
        for b in blocks:
            # CsBlock quirk: '*' snp blocks carry match=1; the PAF nmatch
            # column (minimap2 semantics) counts only ':' exact matches
            if b.type == "identical":
                nmatch += b.match
            if b.type == "identical":
                # ':' runs really are identical (and N-free) on both strands
                tseg = tseq[b.tstart : b.tend].upper()
                if pr.strand == "+":
                    qseg = qseq[b.qstart : b.qend].upper()
                else:
                    qseg = qseq[b.qstart : b.qend].upper().translate(
                        str.maketrans("ACGT", "TGCA"))[::-1]
                assert tseg == qseg
            elif b.type == "del":
                assert tseq[b.tstart : b.tend].lower() == b.tseq
            elif b.type == "snp":
                assert tseq[b.tstart].lower() == b.tseq
                qb = qseq[b.qstart].lower()
                if pr.strand == "-":
                    qb = qb.translate(comp)
                assert qb == b.qseq
            elif b.type == "ins":
                qseg = qseq[b.qstart : b.qend].lower()
                if pr.strand == "-":
                    qseg = qseg.translate(comp)[::-1]
                assert qseg == b.qseq
        assert nmatch == pr.match


def test_stat_enrich_parity(ref, tmp_path):
    """Byte-level parity of the annotation x subgenome enrichment summary
    against the reference's stat_enrich.main (stat_enrich.py:1-41)."""
    import io

    from subphaser import stat_enrich as ref_se  # noqa: E402

    from subphaser_tpu.phase.stat_enrich import stat_enrich

    rng = np.random.default_rng(9)
    anns = ["Gypsy", "Copia", "LINE"]
    sgs = ["SG1", "SG2", "SG3"]
    lines = ["#id\tsubgenome\tp_value\tcounts\n"]
    for i in range(200):
        ann = anns[rng.integers(0, len(anns))]
        sg = sgs[rng.integers(0, len(sgs))]
        counts = ",".join(str(int(x)) for x in rng.integers(0, 50, len(sgs)))
        lines.append(f"{ann}-elem{i}\t{sg}\t{rng.random():.3g}\t{counts}\n")
    tsv = tmp_path / "feat.enrich"
    tsv.write_text("".join(lines))

    ours, theirs = io.StringIO(), io.StringIO()
    stat_enrich(str(tsv), ours)
    ref_se.main(str(tsv), theirs)
    assert ours.getvalue() == theirs.getvalue()


def test_sort_subgenomes_parity(ref):
    """canonical_labels must renumber clusters exactly like the reference's
    Cluster.sort_subgenomes (Cluster.py:119-126) for arbitrary label
    permutations and chromosome-name orders."""
    from subphaser import Cluster as ref_cluster  # noqa: E402

    from subphaser_tpu.ops.kmeans import canonical_labels

    rng = np.random.default_rng(5)
    for trial in range(30):
        n = int(rng.integers(3, 14))
        k = int(rng.integers(2, min(n, 6) + 1))
        labels = rng.integers(0, k, n)
        while len(set(labels.tolist())) < k:  # every cluster non-empty
            labels = rng.integers(0, k, n)
        chrs = [f"chr{rng.integers(0, 1000):03d}_{i}" for i in range(n)]
        c = ref_cluster.Cluster.__new__(ref_cluster.Cluster)
        c.chrs = chrs
        want = c.sort_subgenomes(list(labels))
        order = np.argsort(chrs).astype(np.int32)
        got = np.asarray(canonical_labels(labels.astype(np.int32), order, k))
        assert got.tolist() == want, f"trial {trial}"
