"""Window/feature enrichment, exchange detection, and their output files.

Reimplements reference Stats.py:33-199 + Circos.stack_matrix (Circos.py:831)
vectorized: bins stack into windows by integer division, the per-window x SG
one-sided Fisher exact runs as one batched float64 computation
(ops/stats_host), and the significance triple-gate (min-p <= max_pval,
separation from the second-best p, normalized ratio >= min_ratio,
reference Stats.py:150-192) is pure numpy.

Output files: ``*.subgenome.bin.count`` (reference Seqs.map_kmer3),
``*.bin.enrich`` / ``*.bin.group`` (Stats.enrich_bin), ``*.ltr.enrich`` /
``*.custom.enrich`` (Stats.enrich_ltr).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from itertools import groupby

import numpy as np

from subphaser_tpu.ops import stats_host as hstats
from subphaser_tpu.utils.log import logger


def write_bin_counts(fout, per_chrom, chrom_names, chrom_sizes, bin_size, sg_names):
    """subgenome.bin.count: sparse rows for bins with >= 1 hit."""
    fout.write("\t".join(["#chrom", "start", "end"] + list(sg_names)) + "\n")
    for name, size, arr in zip(chrom_names, chrom_sizes, per_chrom):
        hit = np.flatnonzero(arr.sum(axis=1) > 0)
        for b in hit:
            s = int(b) * bin_size
            e = min(s + bin_size, size)
            counts = "\t".join(str(int(v)) for v in arr[b])
            fout.write(f"{name}\t{s}\t{e}\t{counts}\n")


def stack_windows(per_chrom, chrom_names, bin_size, window_size):
    """Stack fine bins into windows (reference Circos.py:831-842).

    Returns (rownames [(chrom, start, end)], counts (R, S) int64) keeping
    only windows with >= 1 hit, in chromosome order then window order.
    """
    factor = window_size // bin_size
    if window_size % bin_size:
        raise ValueError("window_size must be a multiple of bin_size")
    rownames, rows = [], []
    for name, arr in zip(chrom_names, per_chrom):
        nb = arr.shape[0]
        nw = -(-nb // factor)
        pad = nw * factor - nb
        if pad:
            arr = np.concatenate([arr, np.zeros((pad, arr.shape[1]), arr.dtype)])
        w = arr.reshape(nw, factor, arr.shape[1]).sum(axis=1)
        hit = np.flatnonzero(w.sum(axis=1) > 0)
        for wi in hit:
            start = int(wi) * window_size
            rownames.append((name, start, start + window_size))
            rows.append(w[wi])
    counts = np.array(rows, dtype=np.int64) if rows else np.empty((0, 1), np.int64)
    return rownames, counts


@dataclass
class EnrichRow:
    rowname: tuple | str
    key: str | None      # enriched SG (None if not significant)
    pval: float          # min p
    pvals: np.ndarray    # per-SG p-values
    counts: np.ndarray
    ratios: np.ndarray
    enrich: np.ndarray   # one-hot (S+1)
    sig: bool


def enrich_rows(
    counts: np.ndarray,
    sg_names: list[str],
    rownames: list,
    max_pval: float = 0.05,
    min_ratio: float = 0.5,
    cutoff: float = 1.0,
) -> list[EnrichRow]:
    """Batched reference _enrich + Pvalues.get_enriched (Stats.py:150-192)."""
    if counts.shape[0] == 0:
        return []
    n_sg = counts.shape[1]
    pvals = hstats.fisher_enrich_pvals(counts)  # (R, S) float64
    order = np.argsort(pvals, axis=1, kind="stable")
    min_idx = order[:, 0]
    sub_idx = order[:, 1]
    rows_r = np.arange(counts.shape[0])
    minp = pvals[rows_r, min_idx]
    subp = pvals[rows_r, sub_idx]
    sig = minp <= max_pval
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # separation gate (Stats.py:188-191): skipped when minp == 0
        gate = np.where(minp > 0, (subp / minp) >= (max_pval / subp) * cutoff, True)
    sig &= gate
    total = counts.sum(axis=0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        raw_ratio = counts / total[None, :]
        ratios = raw_ratio / raw_ratio.sum(axis=1, keepdims=True)
    min_ratio_val = ratios[rows_r, min_idx]
    # NaN ratio compares False and therefore stays significant, matching the
    # reference's `if ratio < min_ratio: sig = False` numpy semantics
    with np.errstate(invalid="ignore"):
        sig &= ~(min_ratio_val < min_ratio)

    out = []
    for r in range(counts.shape[0]):
        enrich = np.zeros(n_sg + 1, dtype=np.int64)
        if sig[r]:
            enrich[min_idx[r]] = 1
        else:
            enrich[-1] = 1
        out.append(
            EnrichRow(
                rowname=rownames[r],
                key=sg_names[min_idx[r]] if sig[r] else None,
                pval=float(minp[r]),
                pvals=pvals[r],
                counts=counts[r],
                ratios=ratios[r],
                enrich=enrich,
                sig=bool(sig[r]),
            )
        )
    return out


def is_exchange(obs_sg, exp_sg) -> str:
    if not exp_sg or not obs_sg:
        return "none"
    return "no" if obs_sg == exp_sg else "yes"


def _fmt(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def enrich_bin(
    fout,
    fout2,
    d_sg: dict[str, str],
    counts: np.ndarray,
    sg_names: list[str],
    rownames: list,
    max_pval: float = 0.05,
) -> list[list]:
    """bin.enrich + grouped bin.group (reference Stats.py:75-132)."""
    rows = enrich_rows(counts, sg_names, rownames, max_pval=max_pval)
    lines, pvalues = [], []
    total = consistent = exchange = 0
    for res in rows:
        chrom, start, end = res.rowname
        obs_sg = d_sg.get(chrom)
        pot = is_exchange(obs_sg, res.key)
        line = [
            chrom, start, end, res.key, res.pval,
            ",".join(str(int(v)) for v in res.counts),
            ",".join(repr(float(v)) for v in res.ratios),
            ",".join(str(int(v)) for v in res.enrich),
            ",".join(repr(float(v)) for v in res.pvals),
            pot,
        ]
        lines.append(line)
        pvalues.append(res.pval)
        total += 1
        if pot == "yes":
            exchange += 1
        elif pot == "no":
            consistent += 1
    if total:
        logger.info(
            "Consistent with subgenome assignment: %d (%.2f%%); potential "
            "exchange: %d (%.2f%%)",
            consistent, 100.0 * consistent / total, exchange, 100.0 * exchange / total,
        )
    qvals = hstats.bh_fdr(np.array(pvalues)) if pvalues else []
    header = [
        "#chrom", "start", "end", "subgenome", "p_value", "counts", "ratios",
        "enrich", "pvals", "potential_exchange", "p_corrected",
    ]
    fout.write("\t".join(header) + "\n")
    for line, q in zip(lines, qvals):
        fout.write("\t".join(_fmt(v) for v in line + [float(q)]) + "\n")

    fout2.write(
        "\t".join(
            ["#chrom", "start", "end", "exchange_from", "exchange_to", "N_bins",
             "potential_exchange"]
        )
        + "\n"
    )
    for line in group_exchanges(lines, d_sg):
        fout2.write("\t".join(_fmt(v) for v in line) + "\n")
    return lines


def group_exchanges(lines, d_sg):
    """Group runs of same-SG windows per chromosome (reference Stats.py:119-132)."""
    for chrom, items in groupby(lines, key=lambda x: x[0]):
        obs_sg = d_sg.get(chrom)
        items = [l for l in items if l[3] is not None]
        items = sorted(items, key=lambda x: x[1])
        for sg, xlines in groupby(items, key=lambda x: x[3]):
            xlines = list(xlines)
            yield [
                chrom, xlines[0][1], xlines[-1][2], sg, obs_sg, len(xlines),
                is_exchange(obs_sg, sg),
            ]


_LTR_CHROM_RE = re.compile(r"(\S+?):\d+\-\d+")


def enrich_features(
    fout,
    d_sg: dict[str, str],
    counts: np.ndarray,
    sg_names: list[str],
    rownames: list,
    max_pval: float = 0.05,
) -> tuple[dict, dict]:
    """ltr.enrich / custom.enrich (reference Stats.enrich_ltr, Stats.py:33-73).

    Rownames are feature ids like 'chrom:start-end:...'; the chromosome is
    parsed back out to flag potential exchanges. Returns
    (d_enriched: feature -> SG for significant rows, d_exchange).
    """
    rows = enrich_rows(counts, sg_names, rownames, max_pval=max_pval)
    d_enriched, d_exchange = {}, {}
    lines, pvalues = [], []
    total = consistent = exchange = 0
    for res in rows:
        feat = res.rowname[0] if isinstance(res.rowname, tuple) else res.rowname
        m = _LTR_CHROM_RE.match(feat)
        chrom = m.groups()[0] if m else None
        obs_sg = d_sg.get(chrom)
        sg = res.key if res.sig else None
        pot = is_exchange(obs_sg, sg)
        lines.append(
            [feat, sg, res.pval, ",".join(str(int(v)) for v in res.counts), pot]
        )
        pvalues.append(res.pval)
        if sg:
            d_enriched[feat] = sg
        d_exchange[feat] = pot
        total += 1
        if pot == "yes":
            exchange += 1
        elif pot == "no":
            consistent += 1
    if exchange > 0 and consistent > 0:
        logger.info(
            "Consistent with subgenome assignment: %d (%.2f%%); potential "
            "exchange: %d (%.2f%%)",
            consistent, 100.0 * consistent / total, exchange, 100.0 * exchange / total,
        )
    qvals = hstats.bh_fdr(np.array(pvalues)) if pvalues else []
    header = ["#id", "subgenome", "p_value", "counts", "potential_exchange",
              "p_corrected"]
    fout.write("\t".join(header) + "\n")
    for line, q in zip(lines, qvals):
        fout.write("\t".join(_fmt(v) for v in line + [float(q)]) + "\n")
    return d_enriched, d_exchange
