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
from subphaser_tpu.utils.log import logger


def _decode_chrom(c) -> np.ndarray:
    from subphaser_tpu.ltr.native import unpack_codes

    return unpack_codes(c.packed, c.vmask, c.length)


def fetch_pair_matches(
    genome: PackedGenome, qname: str, tname: str, k: int = 15, mod: int = 16,
    anchor_cache: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device half of a pair alignment: anchors stay on device, the join
    runs on device, and only MATCHED pairs cross the link. Split out of
    :func:`align_pair` so run_align can PREFETCH the next pair's matches
    (device compute + the tunnel download) while the current pair's host
    chaining/gap-DP runs — the two halves are comparable in wall clock, so
    the overlap is ~2x on the blocks phase."""
    from subphaser_tpu.ops.anchors import chrom_anchors_dev, match_anchors_dev

    q = genome.chrom(qname)
    t = genome.chrom(tname)
    acache = anchor_cache if anchor_cache is not None else {}
    if qname not in acache:
        acache[qname] = chrom_anchors_dev(q, k=k, mod=mod)
    if tname not in acache:
        acache[tname] = chrom_anchors_dev(t, k=k, mod=mod)
    return match_anchors_dev(acache[qname], acache[tname])


def align_pair(
    genome: PackedGenome, qname: str, tname: str, k: int = 15, mod: int = 16,
    max_gap: int = 100_000, min_block: int = 20_000, min_anchors: int = 10,
    emit_cs: bool = True, decode_cache: dict | None = None,
    anchor_cache: dict | None = None,
    prefetched: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> list[PafRecord]:
    """``decode_cache``/``anchor_cache`` (optional, managed by run_align)
    memoize decoded chromosome codes and device-resident anchor sets
    across the pairs a chromosome participates in; the
    reverse-complemented target is built lazily, only when a minus-strand
    chain exists. ``prefetched``: matches from :func:`fetch_pair_matches`
    (run_align's pipeline); computed here when absent."""
    q = genome.chrom(qname)
    t = genome.chrom(tname)
    # anchors stay on device; the join runs on device and only matched
    # pairs cross the link (the per-tile anchor downloads dominated the
    # pre-round-3 profile: ~7 s of a 31 s pair through the remote tunnel)
    qpos, tpos, rel = (
        prefetched if prefetched is not None
        else fetch_pair_matches(genome, qname, tname, k=k, mod=mod,
                                anchor_cache=anchor_cache)
    )
    q_codes = t_codes = trc = None
    if emit_cs:
        cache = decode_cache if decode_cache is not None else {}
        if qname not in cache:
            cache[qname] = _decode_chrom(q)
        if tname not in cache:
            cache[tname] = _decode_chrom(t)
        q_codes = cache[qname]
        t_codes = cache[tname]
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
            tags = {"tp": "P", "cm": int(c["n_anchors"])}
            if emit_cs:
                # minimap2-style cs:Z: short tag (reference Paf.py:155-293
                # consumes it for variant calls): anchors give ':' runs,
                # inter-anchor gaps are banded-DP aligned base-level —
                # the whole walk runs in ONE native call (sp_build_cs; the
                # per-anchor Python loop cost ~50 s on chromosome blocks)
                from subphaser_tpu.ltr.native import build_cs_native

                sel = (
                    (qq >= c["q_start"]) & (qq < c["q_end"])
                    & (tt >= c["t_start"]) & (tt < c["t_end"])
                )
                aq_, at_ = qq[sel], tt[sel]
                # colinear subset = longest increasing subsequence in t of
                # the q-sorted anchors (repeat copies create off-diagonal
                # pairs inside the bounding box; greedy keeps the wrong one)
                o = np.lexsort((at_, aq_))
                aq_, at_ = aq_[o], at_[o]
                aq_, at_ = _lis_anchors(aq_, at_)
                if strand_flag == 1 and trc is None:
                    trc = np.ascontiguousarray(
                        np.where(t_codes < 4, 3 - t_codes, 4).astype(np.uint8)[::-1]
                    )
                tgt = t_codes if strand_flag == 0 else trc
                cs_text, nmatch, alen_total = build_cs_native(
                    q_codes, tgt, aq_, at_,
                    int(c["q_start"]), int(c["q_end"]),
                    int(c["t_start"]), int(c["t_end"]), k,
                    minus=strand_flag == 1,
                )
                tags["cs"] = cs_text
                alen_total = max(alen_total, 1)
            records.append(
                PafRecord(
                    qname=qname, qlen=q.length,
                    qstart=int(c["q_start"]), qend=int(c["q_end"]),
                    strand=sym, tname=tname, tlen=t.length,
                    tstart=ts0, tend=te0,
                    nmatch=min(nmatch, alen_total),  # alen_total >= 1 on both paths
                    alen=alen_total, mapq=60,
                    tags=tags,
                )
            )
    return records


def _lis_anchors(aq: np.ndarray, at: np.ndarray):
    """Longest strictly-increasing subsequence of ``at`` (native patience
    sort, ltr/_native sp_lis); input must be sorted by (aq, at). Returns
    the colinear anchor subset."""
    from subphaser_tpu.ltr.native import lis_indices

    if aq.size == 0:
        return aq, at
    idx = lis_indices(at)
    # drop anchors sharing a q start (keep the first)
    keep = np.concatenate([[True], np.diff(aq[idx]) > 0])
    idx = idx[keep]
    return aq[idx], at[idx]


def run_align(
    alt_sgs: list,
    genome: PackedGenome,
    outdir: str,
    min_block: int = 100_000,
    k: int = 15,
    mod: int = 16,
    min_anchors: int = 10,
    max_gap: int = 100_000,
) -> tuple[list[str], dict]:
    """Align all homoeologous chromosome pairs -> PAF files.

    Pair enumeration mirrors reference Blocks.run_align (Blocks.py:16-40):
    for each set, all column pairs, all chromosome combinations between the
    two columns. Returns (paf_paths, offsets) — offsets empty because the
    native path aligns whole chromosomes without cutting.
    """
    os.makedirs(outdir, exist_ok=True)
    have = set(genome.names)
    # enumerate pairs first (grouped by set, so caches stay per-set), then
    # align; in multi-process runs each rank aligns PAIRS it owns
    # (round-robin) and PAF payloads are exchanged — the reference farms
    # the same pair list over its grid pool (Blocks.py:50 pool_run <-
    # RunCmdsMP.py:38-152)
    pair_list: list[tuple[int, str, str]] = []  # (set index, chr1, chr2)
    for si, sg in enumerate(alt_sgs):
        for col1, col2 in combinations(sg, 2):
            for chr1, chr2 in product(col1, col2):
                if chr1 in have and chr2 in have:
                    pair_list.append((si, chr1, chr2))

    import jax as _jax

    nproc = _jax.process_count()
    rank = _jax.process_index()
    paf_text: dict[int, str] = {}
    caches: dict[int, tuple[dict, dict]] = {}
    todo: list[tuple[int, int, str, str]] = []
    for pi, (si, chr1, chr2) in enumerate(pair_list):
        out = os.path.join(outdir, f"{chr1}-{chr2}.paf")
        if os.path.exists(out) and os.path.getsize(out) > 0:
            with open(out) as f:
                paf_text[pi] = f.read()
            continue
        if nproc > 1 and pi % nproc != rank:
            continue
        todo.append((pi, si, chr1, chr2))

    # two-sided pipeline over the pair list:
    # - ONE device thread runs the NEXT pair's anchoring/join + tunnel
    #   download (jax dispatch is thread-safe) — including ACROSS set
    #   boundaries: once the current set's last matches are downloaded its
    #   device anchor arrays are dropped, so the next set's anchors build
    #   while this set's host work drains (the boundary used to serialize
    #   ~3 x 56 s of 667 Mb anchor builds behind an idle host, ~18 min
    #   across wheat's 6 boundaries), with at most one set's anchors on
    #   device at any time (the staged-join memory envelope that the
    #   80 M-anchor kernel-fault fix established).
    # - TWO host threads chain/LIS/gap-DP different pairs concurrently:
    #   chain_anchors/sp_lis/sp_build_cs are ctypes calls that release the
    #   GIL (the DP is OpenMP inside), and at 667 Mb the host half
    #   (~150-250 s/pair) outweighs the device half (~125 s/pair), so the
    #   host side is the blocks-phase critical path.
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    def _caches_for(si: int, keep: tuple) -> tuple[dict, dict]:
        # per-set decoded chromosomes / device anchors; sets outside
        # ``keep`` are unpinned (a host thread still aligning an old pair
        # holds its own reference to that set's dicts — dropping here only
        # releases them once that pair completes)
        for s in [s for s in caches if s not in keep]:
            del caches[s]
        if si not in caches:
            caches[si] = ({}, {})
        return caches[si]

    host_futs: dict[int, tuple] = {}  # pi -> (chr1, chr2, Future)
    with ThreadPoolExecutor(max_workers=1) as devex, \
            ThreadPoolExecutor(max_workers=2) as hostex:
        pending = None  # (index into todo, Future)
        for ti, (pi, si, chr1, chr2) in enumerate(todo):
            nsi = todo[ti + 1][1] if ti + 1 < len(todo) else si
            decode_cache, anchor_cache = _caches_for(si, (si, nsi))
            if pending is not None and pending[0] == ti:
                prefetched = pending[1].result()
            else:
                prefetched = fetch_pair_matches(
                    genome, chr1, chr2, k=k, mod=mod,
                    anchor_cache=anchor_cache)
            pending = None
            if ti + 1 < len(todo):
                _npi, nsi, nc1, nc2 = todo[ti + 1]
                next_anchor_cache = _caches_for(nsi, (si, nsi))[1]
                if nsi != si:
                    # this set's joins are all done (matches downloaded);
                    # free its device anchors before the next set's build
                    anchor_cache.clear()
                pending = (ti + 1, devex.submit(
                    fetch_pair_matches, genome, nc1, nc2, k=k, mod=mod,
                    anchor_cache=next_anchor_cache))
            host_futs[pi] = (chr1, chr2, hostex.submit(
                align_pair,
                genome, chr1, chr2, k=k, mod=mod,
                min_block=max(min_block // 5, 10_000),
                min_anchors=min_anchors, max_gap=max_gap,
                decode_cache=decode_cache,
                anchor_cache=anchor_cache,
                prefetched=prefetched,
            ))
            # bound queued matches (~40 MB/pair at wheat scale): at most 2
            # running + 1 queued host pairs
            while sum(1 for _c1, _c2, f in host_futs.values()
                      if not f.done()) > 3:
                _time.sleep(0.2)
        for pi2, (c1, c2, fut) in host_futs.items():
            recs = fut.result()
            paf_text[pi2] = "".join(r.to_line() + "\n" for r in recs)
            logger.info("Aligned %s vs %s: %d blocks", c1, c2, len(recs))
    if nproc > 1:
        from subphaser_tpu.parallel.distributed import exchange_blobs

        # checkpointed pairs are already present on every rank; exchange
        # fills only the freshly aligned ones (owner = pi % nproc matches
        # the ownership rule above)
        blobs = {pi: t.encode() for pi, t in paf_text.items()}
        merged = exchange_blobs(blobs, len(pair_list))
        paf_text = {pi: b.decode() for pi, b in merged.items()}
        logger.info(
            "Sharded blocks: rank %d aligned %d/%d pairs",
            rank, len(blobs), len(pair_list),
        )
    pafs = []
    for pi, (si, chr1, chr2) in enumerate(pair_list):
        out = os.path.join(outdir, f"{chr1}-{chr2}.paf")
        if not (os.path.exists(out) and os.path.getsize(out) > 0):
            with open(out, "w") as f:
                f.write(paf_text.get(pi, ""))
        pafs.append(out)
    return pafs, {}
