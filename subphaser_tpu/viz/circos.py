"""Circos-style multi-ring genome figure in matplotlib (replaces the Perl
circos + conf-tree pipeline, reference Circos.py:236-842).

Rings, outermost first (matching reference circos_plot's track order,
Circos.py:469-546):
1. karyotype: chromosome arcs colored by assigned subgenome, with labels
2. window enrichment band: each window colored by its enriched subgenome
   (white where not significant; reference circle 1, enrich_col of
   out_sg_lines, Circos.py:619-634)
3. normalized SG-ratio ring: stacked per-window proportions of each
   subgenome's specific k-mers (reference circle 2, ratio_col of
   out_sg_lines, Circos.py:493-505)
4. one density ring per subgenome: specific-k-mer counts per window,
   99th-percentile trimmed (reference stack_bed_density + abnormal,
   Circos.py:777-806, 973-980)
5. LTR ring: density minus enriched — per window, the SG-enriched LTRs
   stack in subgenome colors and the remaining (unenriched) LTRs in grey
   (reference bed_density_minus, Circos.py:515-524, 684-707)
6. center: homoeologous block links from PAF, colored by the query
   chromosome's subgenome
"""

from __future__ import annotations

import math

import numpy as np

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402
from matplotlib.path import Path  # noqa: E402
from matplotlib.patches import PathPatch  # noqa: E402


def _arc(a0: float, a1: float) -> np.ndarray:
    """Theta samples dense enough that fills render as arcs, not chords."""
    n = max(2, int(abs(a1 - a0) / 0.02) + 2)
    return np.linspace(a0, a1, n)


def _trim_upper(values: np.ndarray, pct: float = 99.0) -> np.ndarray:
    """Clamp outliers like the reference's `abnormal` upper cutoff."""
    if values.size == 0:
        return values
    upper = np.percentile(values[values > 0], pct) if (values > 0).any() else 1.0
    return np.minimum(values, max(upper, 1e-9))


class CircosLayout:
    def __init__(self, chrom_sizes: dict[str, int], gap_deg: float = 1.5):
        self.names = list(chrom_sizes)
        self.sizes = chrom_sizes
        n = len(self.names)
        total = sum(chrom_sizes.values())
        gap = math.radians(gap_deg)
        span = 2 * math.pi - n * gap
        self.start = {}
        self.width = {}
        theta = 0.0
        for name in self.names:
            w = span * chrom_sizes[name] / total
            self.start[name] = theta
            self.width[name] = w
            theta += w + gap

    def angle(self, chrom: str, pos: float) -> float:
        return self.start[chrom] + self.width[chrom] * (
            pos / max(self.sizes[chrom], 1)
        )


def circos_plot(
    chrom_sizes: dict[str, int],
    d_sg: dict[str, str],
    sg_names: list[str],
    d_colors: dict[str, str],
    bin_counts: dict[str, np.ndarray],  # chrom -> (nbins, n_sg) fine bins
    bin_size: int,
    window_size: int,
    outfig: str,
    enrich_lines: list | None = None,   # rows from enrich_bin
    ltr_bedlines: list | None = None,   # [chrom, start, end, id]
    enrich_ltr_bedlines: list | None = None,  # per-SG lists of enriched beds
    pafs: list[str] | None = None,
    min_block: int = 100_000,
    legend_file: str | None = None,
):
    layout = CircosLayout(chrom_sizes)
    fig = plt.figure(figsize=(10, 10), dpi=200)
    ax = fig.add_subplot(111, polar=True)
    ax.set_axis_off()
    ax.set_theta_zero_location("N")
    ax.set_theta_direction(-1)
    ax.set_ylim(0, 1.12)

    # ---- ring 1: karyotype -------------------------------------------
    r0, r1 = 1.0, 1.05
    for name in layout.names:
        th = np.linspace(layout.start[name], layout.start[name] + layout.width[name], 64)
        color = d_colors.get(d_sg.get(name), "#cccccc")
        ax.fill_between(th, r0, r1, color=color, lw=0)
        mid = layout.start[name] + layout.width[name] / 2
        deg = math.degrees(mid)
        rot = -deg if deg <= 180 else 180 - deg
        ax.text(mid, 1.09, name, ha="center", va="center", fontsize=8,
                rotation=rot, rotation_mode="anchor")

    # ---- ring 2: enrichment band -------------------------------------
    r0, r1 = 0.945, 0.99
    if enrich_lines:
        for line in enrich_lines:
            chrom, start, end, key = line[0], line[1], line[2], line[3]
            if chrom not in layout.start or key is None:
                continue
            a0 = layout.angle(chrom, start)
            a1 = layout.angle(chrom, min(end, chrom_sizes[chrom]))
            ax.fill_between(_arc(a0, a1), r0, r1,
                            color=d_colors.get(key, "#999999"), lw=0)

    # ---- SG-ratio ring (reference circle 2, Circos.py:493-505) --------
    # stacked per-window normalized proportions (ratio_col of
    # out_sg_lines, Circos.py:619-634): each window is a full-height bar
    # partitioned into subgenome colors by its ratios (they sum to 1)
    ring_h = 0.055
    base = 0.94
    has_ratio_ring = bool(enrich_lines) and len(enrich_lines[0]) > 6
    if has_ratio_ring:
        r_top = base
        r_bot = base - ring_h + 0.008
        for line in enrich_lines:
            chrom, start, end = line[0], line[1], line[2]
            if chrom not in layout.start:
                continue
            ratios = line[6]
            if isinstance(ratios, str):
                ratios = [float(v) for v in ratios.split(",")]
            ratios = np.asarray(ratios, dtype=float)
            if not np.isfinite(ratios).all() or ratios.sum() <= 0:
                continue
            a0 = layout.angle(chrom, start)
            a1 = layout.angle(chrom, min(end, chrom_sizes[chrom]))
            th = _arc(a0, a1)
            cum = 0.0
            for si, sg in enumerate(sg_names[: ratios.size]):
                frac = float(ratios[si])
                if frac <= 0:
                    continue
                lo = r_bot + (r_top - r_bot) * cum
                hi = r_bot + (r_top - r_bot) * min(cum + frac, 1.0)
                ax.fill_between(th, lo, hi, color=d_colors.get(sg, "#777777"),
                                lw=0)
                cum += frac
        fig.text(0.015, 0.985, "ring 3: normalized SG ratio", fontsize=8,
                 color="#333333")
        base -= ring_h

    # ---- density rings per subgenome ---------------------------------
    factor = max(window_size // bin_size, 1)
    windows = {}
    for name, arr in bin_counts.items():
        nb = arr.shape[0]
        nw = -(-nb // factor)
        pad = nw * factor - nb
        a = arr
        if pad:
            a = np.concatenate([a, np.zeros((pad, arr.shape[1]), arr.dtype)])
        windows[name] = a.reshape(nw, factor, arr.shape[1]).sum(axis=1)
    ring_no = 4 if has_ratio_ring else 3
    for si, sg in enumerate(sg_names):
        r_top = base - si * ring_h
        r_bot = r_top - ring_h + 0.008
        all_vals = np.concatenate(
            [w[:, si].astype(float) for w in windows.values()]
        ) if windows else np.zeros(0)
        all_vals = _trim_upper(all_vals)
        vmax = all_vals.max() if all_vals.size and all_vals.max() > 0 else 1.0
        color = d_colors.get(sg, "#777777")
        for name, w in windows.items():
            vals = np.minimum(w[:, si].astype(float), vmax)
            for wi, v in enumerate(vals):
                if v <= 0:
                    continue
                a0 = layout.angle(name, wi * window_size)
                a1 = layout.angle(name, min((wi + 1) * window_size, chrom_sizes[name]))
                h = (r_top - r_bot) * (v / vmax)
                ax.fill_between(_arc(a0, a1), r_bot, r_bot + h, color=color, lw=0)
        fig.text(0.015, 0.96 - 0.025 * si, f"ring {ring_no + si}: {sg} k-mers",
                 fontsize=8, color=color)

    # ---- LTR ring: density minus enriched ------------------------------
    # reference bed_density_minus (Circos.py:684-707): per window the value
    # list is [enriched-in-SG1, ..., enriched-in-SGn, total - sum] — SG
    # colors stack first, the remaining (unenriched) density plots grey
    inner = base - len(sg_names) * ring_h
    if ltr_bedlines:
        fig.text(0.015, 0.96 - 0.025 * len(sg_names),
                 f"ring {ring_no + len(sg_names)}: LTR-RTs", fontsize=8,
                 color="#555555")
        r_top = inner
        r_bot = inner - ring_h + 0.008

        def _density(bedlines):
            d = {name: np.zeros(-(-size // window_size))
                 for name, size in chrom_sizes.items()}
            for chrom, start, _end, *_ in bedlines:
                if chrom in d:
                    d[chrom][int(start) // window_size] += 1
            return d

        dens = _density(ltr_bedlines)
        sg_dens = [_density(bed) for bed in (enrich_ltr_bedlines or [])]
        vals_all = _trim_upper(np.concatenate(list(dens.values())))
        vmax = vals_all.max() if vals_all.size and vals_all.max() > 0 else 1.0
        for name, vals in dens.items():
            vals = np.minimum(vals, vmax)
            for wi, v in enumerate(vals):
                if v <= 0:
                    continue
                a0 = layout.angle(name, wi * window_size)
                a1 = layout.angle(name, min((wi + 1) * window_size, chrom_sizes[name]))
                th = _arc(a0, a1)
                scale = (r_top - r_bot) / vmax
                lo = r_bot
                used = 0.0
                for si, d_sg_dens in enumerate(sg_dens):
                    e = min(float(d_sg_dens[name][wi]), v - used)
                    if e <= 0:
                        continue
                    color = d_colors.get(sg_names[si], "#777777") \
                        if si < len(sg_names) else "#777777"
                    ax.fill_between(th, lo, lo + e * scale, color=color, lw=0)
                    lo += e * scale
                    used += e
                rest = v - used
                if rest > 0:
                    ax.fill_between(th, lo, lo + rest * scale,
                                    color="#555555", lw=0)
        inner = r_bot - 0.01

    # ---- block links --------------------------------------------------
    if pafs:
        from subphaser_tpu.blocks.paf import primary_blocks

        for path in pafs:
            for rec in primary_blocks(path, min_block=min_block):
                if rec.qname not in layout.start or rec.tname not in layout.start:
                    continue
                a_q = layout.angle(rec.qname, (rec.qstart + rec.qend) / 2)
                a_t = layout.angle(rec.tname, (rec.tstart + rec.tend) / 2)
                color = d_colors.get(d_sg.get(rec.qname), "#999999")
                verts = [(a_q, inner), (0, 0), (a_t, inner)]
                codes = [Path.MOVETO, Path.CURVE3, Path.CURVE3]
                # width scales with block span so big syntenic blocks read
                lw = min(0.5 + 4.0 * rec.qspan / max(rec.qlen, 1), 5.0)
                ax.add_patch(
                    PathPatch(Path(verts, codes), fill=False, lw=lw,
                              edgecolor=color, alpha=0.45)
                )

    fig.savefig(outfig, bbox_inches="tight")
    plt.close(fig)

    if legend_file:
        with open(legend_file, "w") as f:
            f.write("Circos tracks, outermost to innermost:\n")
            f.write("1. Karyotype colored by assigned subgenome\n")
            f.write("2. Window enrichment: significantly enriched subgenome per "
                    f"{window_size} bp window\n")
            if has_ratio_ring:
                f.write("3. Normalized proportion of each subgenome's "
                        "specific k-mers per window\n")
            for i, sg in enumerate(sg_names):
                f.write(f"{ring_no + i}. {sg}-specific k-mer density per window\n")
            if ltr_bedlines:
                f.write(f"{ring_no + len(sg_names)}. LTR-RT density per window "
                        "(subgenome colors = SG-enriched LTRs, grey = rest)\n")
            if pafs:
                f.write("center: homoeologous blocks colored by query "
                        "chromosome subgenome\n")
