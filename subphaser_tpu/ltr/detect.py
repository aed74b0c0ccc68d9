"""LTR-RT detection: TPU seed matching + native refinement.

Replaces `gt suffixerator + ltrharvest` / `ltr_finder` (reference
LTR.py:33-61): instead of building suffix arrays per 20 Mb shell job, the
device finds candidate direct-repeat seed pairs with the same sorted-k-mer
machinery used for counting — positions carried through the sort, pairs
taken between nearby run-mates within the LTR distance window — and the
irregular per-candidate work (cluster, X-drop extend, banded identity, TSD)
runs in the native library (ltr/_native/native.cpp).

Default constraints mirror the reference's ltr_harvest invocation
(`-similar 80 -vic 10 -seed 20 -minlenltr 100 -maxlenltr 7000 -mintsd 4
-maxtsd 6`, reference __main__.py:146-152) with gt's own defaults for
mindistltr (1000) / maxdistltr (15000).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
from subphaser_tpu.ltr import native
from subphaser_tpu.ltr.records import LTRRecord, parse_scn, write_scn
from subphaser_tpu.utils.log import logger

DEFAULT_PARAMS = dict(
    k=15,
    seed=20,
    minlenltr=100,
    maxlenltr=7000,
    mindistltr=1000,
    maxdistltr=15000,
    similar=80.0,
    mintsd=4,
    maxtsd=6,
    vic=10,
    xdrop=10,
    band=50,
    max_gap=2000,
)


def parse_harvest_options(options: str | None) -> dict:
    """Map `-ltr_harvest_options` flags onto detector params."""
    params = dict(DEFAULT_PARAMS)
    if not options:
        return params
    toks = options.split()
    keymap = {
        "-seed": ("seed", int),
        "-minlenltr": ("minlenltr", int),
        "-maxlenltr": ("maxlenltr", int),
        "-mindistltr": ("mindistltr", int),
        "-maxdistltr": ("maxdistltr", int),
        "-similar": ("similar", float),
        "-mintsd": ("mintsd", int),
        "-maxtsd": ("maxtsd", int),
        "-vic": ("vic", int),
        "-xdrop": ("xdrop", int),
    }
    for i, t in enumerate(toks):
        if t in keymap and i + 1 < len(toks):
            key, conv = keymap[t]
            try:
                params[key] = conv(toks[i + 1])
            except ValueError:
                pass
    return params


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_pos_words", "max_shift", "cap", "phase"),
)
def seed_pairs(
    words,
    vwords,
    *,
    k: int,
    n_pos_words: int,
    mindist: int,
    maxdist: int,
    max_shift: int = 32,
    cap: int = 1 << 18,
    phase: int = 1,
):
    """Direct-repeat seed pairs (i, j) with j - i in [mindist, maxdist].

    Sorts forward-strand codes (direct repeats match on the same strand)
    carrying positions; pairs each element with its next ``max_shift``
    run-mates. Sorting on (code, position) — two keys — makes run-mates
    positionally ordered, so shift s reaches the s-th NEAREST downstream
    copy: a high-copy repeat family only loses an element's LTR pair when
    more than ``max_shift`` same-code copies sit between its two LTRs
    (< maxdist apart). Returns (i, j) int32 arrays of length cap, -1 padded.

    ``phase`` > 1 keeps only pairs whose LEFT position is a multiple of
    ``phase`` — the k-mer-domain equivalent of ltrharvest's ``-seed``
    minimum maximal-repeat length: a maximal match of length >=
    k + phase - 1 always contains a phase-aligned window, so with
    phase = seed - k + 1 every >= seed bp repeat is still seeded while the
    ~phase-fold sliding-window duplication (every window of one long
    match emitting its own pair) is dropped at the source.
    """
    codes = forward_codes(words, vwords, k, n_pos_words)  # (16, W)
    p = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 0)
    w = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
    pos = w * 16 + p
    flat = codes.reshape(-1)
    posf = pos.reshape(-1)
    sc, sp = jax.lax.sort((flat, posf), num_keys=2)
    n = sc.shape[0]

    masks = []
    ii = []
    jj = []
    for s in range(1, max_shift + 1):
        same = (sc[:-s] == sc[s:]) & (sc[:-s] != SENTINEL)
        d = sp[s:] - sp[:-s]
        ad = jnp.abs(d)
        ok = same & (ad >= mindist) & (ad <= maxdist)
        i_ = jnp.minimum(sp[:-s], sp[s:])
        j_ = jnp.maximum(sp[:-s], sp[s:])
        if phase > 1:
            ok = ok & (i_ % phase == 0)
        pad = jnp.zeros(s, dtype=bool)
        masks.append(jnp.concatenate([ok, pad]))
        ii.append(jnp.concatenate([i_, jnp.full(s, -1, jnp.int32)]))
        jj.append(jnp.concatenate([j_, jnp.full(s, -1, jnp.int32)]))
    mask = jnp.stack(masks).reshape(-1)
    iarr = jnp.stack(ii).reshape(-1)
    jarr = jnp.stack(jj).reshape(-1)
    # compaction by cumsum + searchsorted: the t-th surviving pair sits at
    # the first index where the running count reaches t. jnp.where(size=)
    # lowers through a full-length scatter-add (bincount) — over this
    # 32*n stacked mask it cost ~4 s per 4 Mb tile on the v5e; the
    # contiguous scan + cap binary searches cost milliseconds.
    csum = jnp.cumsum(mask.astype(jnp.int32))
    n_total = csum[-1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    sel = jnp.searchsorted(csum, targets)
    valid = targets <= n_total
    sel_c = jnp.minimum(sel, mask.shape[0] - 1)
    out_i = jnp.where(valid, iarr[sel_c], -1)
    out_j = jnp.where(valid, jarr[sel_c], -1)
    return out_i, out_j, n_total


SEED_DOWNLOAD_CHUNK = 1 << 16


def _iter_tile_seeds(chrom, prm, k: int, tile_bases: int, overlap: int,
                     seed_cap: int, label: str):
    """Yield (start, words, vwords, si, sj) per tile with a dispatch-ahead
    window: tile N+1..N+3's device compute overlaps tile N's host download
    (through the remote tunnel the downloads otherwise serialize), and only
    ceil(n_total / chunk) fixed windows of the pair arrays cross the link —
    the -1 padding (usually >90% of the cap) never downloads."""
    from collections import deque

    from subphaser_tpu.ops.count import _slice_chunk

    n_pos = tile_bases + overlap
    n_pos_words = n_pos // 16
    n_words = n_pos_words + 1

    # ltrharvest -seed semantics: only pairs at phase-aligned left positions
    # (one seed per >= seed-bp maximal repeat instead of one per window)
    phase = max(1, int(prm.get("seed", 20)) - k + 1)

    def dispatch(start, cap):
        w0 = start // 16
        words = np.zeros(n_words, dtype=np.int32)
        vwords = np.zeros(n_words, dtype=np.int32)
        avail = min(n_words, chrom.packed.shape[0] - w0)
        if avail <= 0:
            return None
        words[:avail] = chrom.packed[w0 : w0 + avail]
        vwords[:avail] = chrom.vmask[w0 : w0 + avail]
        si, sj, n_total = seed_pairs(
            words, vwords, k=k, n_pos_words=n_pos_words,
            mindist=prm["mindistltr"], maxdist=prm["maxdistltr"], cap=cap,
            phase=phase,
        )
        return [start, words, vwords, si, sj, n_total, cap]

    def collect(entry):
        start, words, vwords, si, sj, n_total, cap = entry
        n = int(n_total)
        while n > cap and cap < (1 << 23):
            cap *= 4  # repeat-dense tile: retry with more room
            start, words, vwords, si, sj, n_total, cap = dispatch(start, cap)
            n = int(n_total)
        if n > cap:
            logger.warning(
                "%s seed cap overflow on %s @%d: %d pairs > cap %d; "
                "repeat-dense region, candidates may be incomplete",
                label, chrom.name, start, n, cap,
            )
            n = cap
        chunk = min(SEED_DOWNLOAD_CHUNK, cap)  # cap is pow2: chunk divides it
        n_chunks = max(1, -(-n // chunk))
        parts = [
            _slice_chunk(si, sj, np.int32(i * chunk), chunk)
            for i in range(n_chunks)
        ]
        si_h = np.concatenate([np.asarray(p[0]) for p in parts])
        sj_h = np.concatenate([np.asarray(p[1]) for p in parts])
        m = si_h >= 0
        return start, words, vwords, si_h[m], sj_h[m]

    window: deque = deque()
    for start in range(0, chrom.length, tile_bases):
        entry = dispatch(start, seed_cap)
        if entry is None:
            continue
        window.append(entry)
        if len(window) > 3:
            yield collect(window.popleft())
    while window:
        yield collect(window.popleft())


def detect_ltr_chrom(
    chrom,
    params: dict,
    tile_bases: int = 1 << 22,
    overlap: int = 1 << 15,
    seed_cap: int = 1 << 18,
) -> list[LTRRecord]:
    """Detect LTR candidates on one packed chromosome."""
    k = params["k"]
    n_pos = tile_bases + overlap
    prm = {key: params[key] for key in DEFAULT_PARAMS}
    records: list[LTRRecord] = []
    for start, words, vwords, si, sj in _iter_tile_seeds(
        chrom, prm, k, tile_bases, overlap, seed_cap, "LTR"
    ):
        if si.size == 0:
            continue
        seq = native.unpack_codes(words, vwords, n_pos)
        cands = native.refine_ltr(seq, si, sj, prm)
        for c in cands:
            gstart = int(c["start"]) + start  # 0-based
            if gstart >= start + tile_bases and start + tile_bases < chrom.length:
                continue  # owned by the next tile (dedupe across overlaps)
            gend = int(c["end"]) + start  # 0-based exclusive
            if gend > chrom.length:
                continue
            records.append(
                LTRRecord(
                    seq_id=chrom.name,
                    start=gstart + 1,
                    end=gend,
                    lltr=int(c["lltr_len"]),
                    rltr=int(c["rltr_len"]),
                    similarity=float(c["similarity"]),
                    tsd_len=int(c["tsd_len"]),
                )
            )
    return records


def parse_finder_options(options: str | None) -> dict:
    """Map `-ltr_finder_options` flags (-D/-d/-L/-l/-M, reference
    __main__.py:141-145) onto the finder detector parameters.

    Score-scale calibration vs ltr_finder (documented deviation closed):
    ltr_finder's ``-w`` is its OUTPUT FORMAT flag (``-w 2`` = table), not
    a score threshold — it is parsed and ignored here because the native
    detector always emits .scn records. ltr_finder's reported score sums
    ~11 feature points (LTR pair + TSD + TG..CA motif + PBS + PPT + ORF
    signals); the native finder's quality gate counts the 4 structural
    signals it detects (TG..CA / TSD / PBS / PPT) and keeps candidates
    showing >= ``min_score`` of them (default 2 ~= ltr_finder's practical
    "two corroborating features" floor). The gate is adjustable with the
    extension token ``-min_score N``. ``-M`` maps exactly: minimum
    LTR-pair similarity (0-1 -> percent)."""
    params = dict(DEFAULT_PARAMS)
    params["min_score"] = 2
    if not options:
        return params
    toks = options.split()
    keymap = {
        "-D": ("maxdistltr", int),
        "-d": ("mindistltr", int),
        "-L": ("maxlenltr", int),
        "-l": ("minlenltr", int),
        "-min_score": ("min_score", int),
    }
    for i, t in enumerate(toks):
        if t in keymap and i + 1 < len(toks):
            key, conv = keymap[t]
            try:
                params[key] = conv(toks[i + 1])
            except ValueError:
                pass
        elif t == "-M" and i + 1 < len(toks):
            try:
                params["similar"] = 100.0 * float(toks[i + 1])
            except ValueError:
                pass
    return params


_FLAG_NAMES = ((1, "TGCA"), (2, "TSD"), (4, "PBS"), (8, "PPT"))


def detect_finder_chrom(
    chrom,
    params: dict,
    tile_bases: int = 1 << 22,
    overlap: int = 1 << 15,
    seed_cap: int = 1 << 18,
) -> list[LTRRecord]:
    """Finder-style detection on one packed chromosome.

    A second, structurally distinct detector (reference runs `ltr_finder`
    alongside LTRharvest and merges, LTR.py:33-61): candidates come from
    COLINEAR SEED CHAINS (native minimap2-flavored DP over the same device
    seed pairs — tolerant of indel drift between the LTR copies that splits
    the harvest-style diagonal clusters), then each chain is gated on the
    structural signals ltr_finder scores: TG..CA termini, TSD, PBS (tRNA
    primer site), PPT (polypurine tract), with strand inferred from the
    PBS/PPT orientation (reference record columns at LTR.py:715-725)."""
    k = params["k"]
    min_score = int(params.get("min_score", 2))
    n_pos = tile_bases + overlap
    prm = {key: params[key] for key in DEFAULT_PARAMS}
    records: list[LTRRecord] = []
    for start, words, vwords, si, sj in _iter_tile_seeds(
        chrom, prm, k, tile_bases, overlap, seed_cap, "LTR finder"
    ):
        if si.size == 0:
            continue
        chains = native.chain_anchors(
            si.astype(np.int64), sj.astype(np.int64),
            np.full(si.size, k, np.int32), strand=1,
            max_gap=prm["max_gap"], min_chain_len=k, min_chain_anchors=2,
        )
        if chains.size == 0:
            continue
        seq = native.unpack_codes(words, vwords, n_pos)
        cands = native.finder_ltr(
            seq, chains["q_start"], chains["q_end"], chains["t_start"],
            chains["t_end"], prm, min_score=min_score,
        )
        for c in cands:
            gstart = int(c["start"]) + start  # 0-based
            if gstart >= start + tile_bases and start + tile_bases < chrom.length:
                continue  # owned by the next tile (dedupe across overlaps)
            gend = int(c["end"]) + start  # 0-based exclusive
            if gend > chrom.length:
                continue
            flags = int(c["flags"])
            records.append(
                LTRRecord(
                    seq_id=chrom.name,
                    start=gstart + 1,
                    end=gend,
                    lltr=int(c["lltr_len"]),
                    rltr=int(c["rltr_len"]),
                    similarity=float(c["similarity"]),
                    tsd_len=int(c["tsd_len"]),
                    strand={1: "+", -1: "-"}.get(int(c["strand"]), "?"),
                    score=int(c["score"]),
                    motifs=",".join(nm for b, nm in _FLAG_NAMES if flags & b)
                    or None,
                )
            )
    return records


def detect_ltr(
    genome: PackedGenome,
    options: str | None = None,
    detectors: list[str] | None = None,
    finder_options: str | None = None,
    checkpoint_prefix: str | None = None,
    **kw,
) -> list[LTRRecord]:
    """Run the requested detectors and merge their outputs (the reference
    merges LTRharvest + ltr_finder the same way, LTR.py:80-142): the
    harvest-style diagonal-cluster detector, the finder-style chain+structure
    detector, or both; duplicates resolve downstream.

    ``checkpoint_prefix``: when set, each chromosome's candidates stream to
    ``<prefix>.part.<chrom>.scn`` as they finish, and an existing part file
    short-circuits that chromosome on resume — at wheat scale detection runs
    ~30 min across 21 chromosomes and the whole-.scn checkpoint alone would
    lose all of it to a mid-phase crash (the reference's grid journals
    per-job .completed markers the same way, RunCmdsMP.py:398-416)."""
    detectors = detectors or ["ltr_harvest"]
    runs = []
    if "ltr_harvest" in detectors:
        runs.append((detect_ltr_chrom, parse_harvest_options(options)))
    if "ltr_finder" in detectors:
        runs.append((detect_finder_chrom, parse_finder_options(finder_options)))
    if not runs:
        runs.append((detect_ltr_chrom, parse_harvest_options(options)))
    # multi-process: detect only owned chromosomes, exchange per-chromosome
    # candidate lists afterwards (reference farms LTRharvest chunks over
    # the grid: RunCmdsMP.py:38-152 <- LTR.py:44-61 run_job)
    import jax as _jax

    nproc = _jax.process_count()
    if nproc > 1:
        from subphaser_tpu.parallel.distributed import owns_chrom
    per_chrom: dict[int, list[LTRRecord]] = {}
    for ci, chrom in enumerate(genome.chroms):
        if nproc > 1 and not owns_chrom(ci):
            continue
        part = (
            f"{checkpoint_prefix}.part.{chrom.name}.scn"
            if checkpoint_prefix else None
        )
        if part and os.path.exists(part):
            recs = parse_scn(part)
            logger.info(
                "LTR detection on %s: %d candidates (resumed from %s)",
                chrom.name, len(recs), part,
            )
            per_chrom[ci] = recs
            continue
        seen: set = set()
        recs: list[LTRRecord] = []
        for fn, params in runs:
            for r in fn(chrom, params, **kw):
                if r.key not in seen:
                    seen.add(r.key)
                    recs.append(r)
        logger.info("LTR detection on %s: %d candidates", chrom.name, len(recs))
        if part:
            tmp = part + ".tmp"
            with open(tmp, "w") as f:
                write_scn(recs, f)
            os.replace(tmp, part)
        per_chrom[ci] = recs
    if nproc > 1:
        import io

        from subphaser_tpu.ltr.records import parse_scn_lines
        from subphaser_tpu.parallel.distributed import exchange_blobs

        blobs = {}
        for ci, recs in per_chrom.items():
            buf = io.StringIO()
            write_scn(recs, buf)
            blobs[ci] = buf.getvalue().encode()
        merged = exchange_blobs(blobs, len(genome.chroms))
        for ci, b in merged.items():
            if ci in per_chrom:
                continue
            per_chrom[ci] = parse_scn_lines(b.decode().splitlines())
        logger.info(
            "Sharded LTR detection: rank %d detected %d chromosomes, "
            "merged %d", _jax.process_index(), len(blobs), len(merged),
        )
    all_records: list[LTRRecord] = []
    for ci in range(len(genome.chroms)):
        all_records.extend(per_chrom.get(ci, []))
    return all_records
