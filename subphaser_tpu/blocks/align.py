"""Homoeologous-block identification: device anchors + native chaining.

Replaces the reference's per-pair minimap2 runs (reference Blocks.py:7-56,
__main__.py:699-713): chromosome pairs come from the column combinations of
each homoeologous set; each pair is seeded with mod-sampled canonical k-mer
anchors on device and chained into colinear blocks natively; results are
written as PAF with tp:A:P tags so downstream consumers (circos links) see
a minimap2-compatible file.
"""

from __future__ import annotations

import os
from itertools import combinations, product

import numpy as np

from subphaser_tpu.blocks.paf import PafRecord
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ltr.native import chain_anchors
from subphaser_tpu.ops.anchors import chrom_anchors, match_anchors
from subphaser_tpu.utils.log import logger


def align_pair(
    genome: PackedGenome, qname: str, tname: str, k: int = 15, mod: int = 16,
    max_gap: int = 100_000, min_block: int = 20_000, min_anchors: int = 10,
) -> list[PafRecord]:
    q = genome.chrom(qname)
    t = genome.chrom(tname)
    qc, qp, qs = chrom_anchors(q, k=k, mod=mod)
    tc, tp, ts = chrom_anchors(t, k=k, mod=mod)
    qpos, tpos, rel = match_anchors(qc, qp, qs, tc, tp, ts)
    records: list[PafRecord] = []
    for strand_flag, sym in ((0, "+"), (1, "-")):
        m = rel == strand_flag
        if m.sum() == 0:
            continue
        qq, tt = qpos[m], tpos[m]
        if strand_flag == 1:
            tt = t.length - k - tt  # mirror so minus-strand chains run colinear
        alen = np.full(qq.size, k, dtype=np.int32)
        chains = chain_anchors(
            qq, tt, alen, 1 if strand_flag == 0 else -1,
            max_gap=max_gap, min_chain_len=min_block,
            min_chain_anchors=min_anchors,
        )
        for c in chains:
            ts0, te0 = int(c["t_start"]), int(c["t_end"])
            if strand_flag == 1:
                ts0, te0 = t.length - te0, t.length - ts0
            nmatch = int(c["n_anchors"]) * k
            alen_total = max(int(c["q_end"] - c["q_start"]), 1)
            records.append(
                PafRecord(
                    qname=qname, qlen=q.length,
                    qstart=int(c["q_start"]), qend=int(c["q_end"]),
                    strand=sym, tname=tname, tlen=t.length,
                    tstart=ts0, tend=te0,
                    nmatch=min(nmatch, alen_total), alen=alen_total, mapq=60,
                    tags={"tp": "P", "cm": int(c["n_anchors"])},
                )
            )
    return records


def run_align(
    alt_sgs: list,
    genome: PackedGenome,
    outdir: str,
    min_block: int = 100_000,
    k: int = 15,
    mod: int = 16,
) -> tuple[list[str], dict]:
    """Align all homoeologous chromosome pairs -> PAF files.

    Pair enumeration mirrors reference Blocks.run_align (Blocks.py:16-40):
    for each set, all column pairs, all chromosome combinations between the
    two columns. Returns (paf_paths, offsets) — offsets empty because the
    native path aligns whole chromosomes without cutting.
    """
    os.makedirs(outdir, exist_ok=True)
    have = set(genome.names)
    pafs = []
    for sg in alt_sgs:
        for col1, col2 in combinations(sg, 2):
            for chr1, chr2 in product(col1, col2):
                if chr1 not in have or chr2 not in have:
                    continue
                out = os.path.join(outdir, f"{chr1}-{chr2}.paf")
                if os.path.exists(out) and os.path.getsize(out) > 0:
                    pafs.append(out)
                    continue
                recs = align_pair(
                    genome, chr1, chr2, k=k, mod=mod,
                    min_block=max(min_block // 5, 10_000),
                )
                with open(out, "w") as f:
                    for r in recs:
                        f.write(r.to_line() + "\n")
                logger.info("Aligned %s vs %s: %d blocks", chr1, chr2, len(recs))
                pafs.append(out)
    return pafs, {}
