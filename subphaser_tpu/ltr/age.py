"""LTR insertion-age estimation, summary table, and density/histogram plots.

Reproduces reference LTR.plot_insert_age + summary_ltr_time
(LTR.py:474-606): JC69 ages per subgenome-specific LTR, the
``.insert.data`` / ``.insert.summary`` files, and matplotlib versions of the
ggplot2 density/histogram figures.
"""

from __future__ import annotations

import numpy as np

from subphaser_tpu.ltr.records import LTRRecord
from subphaser_tpu.utils.log import logger


def plot_insert_age(
    ltrs: list[LTRRecord],
    d_enriched: dict[str, str],
    prefix: str,
    mu: float = 7e-9,
    exclude_exchanges: bool = False,
    d_exchange: dict | None = None,
    shared: dict | None = None,
    non_specific: bool = False,
    figfmt: str = "pdf",
    d_colors: dict | None = None,
) -> list[LTRRecord]:
    d_exchange = d_exchange or {}
    shared = shared or {}
    datfile = prefix + ".data"
    d_data: dict[str, list[float]] = {}
    enriched_ltrs: list[LTRRecord] = []
    excluded = 0
    with open(datfile, "w") as fout:
        fout.write("ltr\tsg\tage\n")
        for ltr in ltrs:
            age = ltr.estimate_age(mu=mu)
            if ltr.id in d_enriched:
                sg = d_enriched[ltr.id]
                ltr.sg = sg
                ltr.exchange = d_exchange.get(ltr.id)
                enriched_ltrs.append(ltr)
                if exclude_exchanges and ltr.exchange == "yes":
                    excluded += 1
                    continue
            elif ltr.id in shared:
                sg = "shared"
                ltr.sg = sg
            elif non_specific:
                sg = "non-specific"
                ltr.sg = sg
            else:
                continue
            age_my = age / 1e6
            fout.write(f"{ltr.id}\t{sg}\t{age_my}\n")
            d_data.setdefault(sg, []).append(age_my)
    if exclude_exchanges:
        logger.info("%d potentially exchanged LTR-RTs are excluded", excluded)

    sumfile = prefix + ".summary"
    with open(sumfile, "w") as fout:
        summary_ltr_time(d_data, fout)

    if d_data:
        _plot_age(d_data, prefix, figfmt, d_colors or {})
    return enriched_ltrs


def summary_ltr_time(d_data: dict[str, list[float]], fout) -> dict[str, str]:
    fout.write("# Summary of LTR insertion age (million years)\n")
    fout.write("\t".join(["#subgenome", "mean", "median", "standard_deviation",
                          "75%-CI", "95%-CI", "99%-CI"]) + "\n")
    d_info: dict[str, str] = {}
    xages: list[float] = []
    medians, lo95s, hi95s = [], [], []
    for sg, ages in sorted(d_data.items()):
        xages += ages
        a = np.array(ages)
        med = np.median(a)
        medians.append(med)
        lo95 = np.percentile(a, 2.5)
        hi95 = np.percentile(a, 97.5)
        lo95s.append(lo95)
        hi95s.append(hi95)
        ci75 = f"{np.percentile(a, 12.5):.3f}-{np.percentile(a, 87.5):.3f}"
        ci95 = f"{abs(lo95):.3f}-{hi95:.3f}"
        ci99 = f"{abs(np.percentile(a, 0.5)):.3f}-{np.percentile(a, 99.5):.3f}"
        fout.write(
            f"{sg}\t{a.mean():.3f}\t{med:.3f}\t{np.std(a):.3f}\t{ci75}\t{ci95}\t{ci99}\n"
        )
        d_info[sg] = f"{med:.3f} ({ci95})"
    if xages:
        xa = np.array(xages)
        logger.info("Summary of overall LTR insertion age (million years):")
        logger.info(
            "\tmedian: %.3f\t95%% CI (percentile-based): %.3f-%.3f",
            np.median(xa), abs(np.percentile(xa, 2.5)), np.percentile(xa, 97.5),
        )
        logger.info(
            "A rough estimation of the divergence-hybridization period: "
            "%.3f-%.3f (%.3f)",
            np.mean(hi95s), np.mean(lo95s), np.mean(medians),
        )
    return d_info


def _plot_age(d_data, prefix, figfmt, d_colors):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    try:
        from scipy.stats import gaussian_kde
    except ImportError:
        gaussian_kde = None

    all_ages = np.concatenate([np.array(v) for v in d_data.values()])
    xmax = np.percentile(all_ages, 99.5) if all_ages.size else 1.0

    # density (reference's ggplot2 geom_line(stat="density"))
    plt.figure(figsize=(7, 7), dpi=300, tight_layout=True)
    xs = np.linspace(0, max(xmax, 1e-6), 512)
    for sg, ages in sorted(d_data.items()):
        a = np.array(ages)
        color = d_colors.get(sg)
        if gaussian_kde is not None and a.size > 1 and np.std(a) > 0:
            dens = gaussian_kde(a)(xs)
            plt.plot(xs, dens, lw=2.0, label=sg, color=color)
        else:
            plt.axvline(a.mean() if a.size else 0, label=sg, color=color)
    plt.xlabel("LTR insertion age (million years)", fontsize=15)
    plt.ylabel("Density", fontsize=15)
    plt.legend(title=None, fontsize=13)
    plt.savefig(f"{prefix}.density.{figfmt}", bbox_inches="tight", dpi=300)
    plt.close()

    # stacked histogram (geom_histogram equivalent)
    plt.figure(figsize=(7, 7), dpi=300, tight_layout=True)
    keys = sorted(d_data)
    plt.hist(
        [np.array(d_data[sg]) for sg in keys],
        bins=30, stacked=True, label=keys,
        color=[d_colors.get(sg) for sg in keys] if d_colors else None,
    )
    plt.xlabel("LTR insertion age (million years)", fontsize=15)
    plt.ylabel("Frequence", fontsize=15)
    plt.legend(fontsize=13)
    plt.savefig(f"{prefix}.histo.{figfmt}", bbox_inches="tight", dpi=300)
    plt.close()
