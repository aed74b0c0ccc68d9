"""Counting orchestration: genome -> per-chromosome spectra -> k-mer matrix.

Device work is the per-tile canonical-code extraction + sort/RLE
(ops/count); this module streams tiles, accumulates spectra, applies the
``lower_count`` dump threshold (jellyfish ``dump -L``, reference
Jellyfish.py:697-703), and assembles the sparse candidate count matrix the
differential filter consumes (replacing the reference's dict-of-lists merge,
Jellyfish.py:439-460).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from subphaser_tpu.io.genome import DEFAULT_TILE_BASES, PackedGenome
from subphaser_tpu.ops.count import (
    SpectrumAccumulator,
    count_tile,
    count_tile_batch,
    merge_host,
)
from subphaser_tpu.utils.log import logger
from subphaser_tpu.utils.profiling import Throughput


@dataclass
class ChromSpectrum:
    name: str
    codes: np.ndarray   # int32 sorted unique canonical codes (count>=lower)
    counts: np.ndarray  # int64
    total: int          # sum of counts (== reference dump "tot" / lengths[i])


def count_genome(
    genome: PackedGenome,
    k: int,
    lower_count: int = 3,
    tile_bases: int = DEFAULT_TILE_BASES,
    device_budget: int = 1 << 28,
    batch_tiles: int = 4,
    checkpoint=None,
    mesh=None,
) -> list[ChromSpectrum]:
    """Count canonical k-mers per chromosome on device.

    Checkpoints key on each chromosome's full-content signature (not the
    input-file digest), so a changed TARGET SET reuses every unchanged
    chromosome's spectrum — the reference's -re_filter workflow
    (__main__.py:352-354) — while any sequence edit invalidates it.

    With ``mesh`` (a 1-D jax Mesh with a "data" axis spanning >1 device),
    each chromosome's tiles are data-sharded and the spectrum is discovered
    with the all_to_all range exchange (parallel/sharded_count) — the
    device-native version of the reference's per-chromosome jellyfish
    process pool (Jellyfish.py:671-676). The host-side result is identical
    to the single-device path, so downstream files are byte-identical.
    """
    from collections import deque

    from subphaser_tpu.ops.count import (
        count_codes_async,
        count_codes_collect,
        extract_codes_batch,
    )

    n_pos_words = tile_bases // 16
    results: dict[int, ChromSpectrum] = {}
    meter = Throughput("kmer counting", unit="Mbp")
    counted_mbp = 0.0

    # multi-PROCESS runs (jax.distributed): round-robin chromosome
    # ownership, then one collective exchange of the thresholded spectra —
    # the reference's DRMAA array-jobs + parent merge (RunCmdsMP.py:38-217)
    # as a jax.distributed allgather. Downstream steps run identically on
    # every process, so output files are byte-identical across ranks.
    import jax as _jax

    nproc = _jax.process_count()
    if nproc > 1:
        from subphaser_tpu.parallel.distributed import owns_chrom

        logger.info(
            "Distributed counting: process %d/%d owns %d of %d chromosomes",
            _jax.process_index(), nproc,
            sum(owns_chrom(i) for i in range(len(genome.chroms))),
            len(genome.chroms),
        )

    def batches_of(tiles):
        for lo in range(0, len(tiles), batch_tiles):
            batch = tiles[lo : lo + batch_tiles]
            if len(batch) == 1:
                yield batch[0].words, batch[0].vwords
                continue
            words = np.stack([t.words for t in batch])
            vwords = np.stack([t.vwords for t in batch])
            if len(batch) < batch_tiles:
                # pad with empty (all-invalid) tiles to keep one jit shape
                pad = batch_tiles - len(batch)
                words = np.concatenate(
                    [words, np.zeros((pad,) + words.shape[1:], words.dtype)]
                )
                vwords = np.concatenate(
                    [vwords, np.zeros((pad,) + vwords.shape[1:], vwords.dtype)]
                )
            yield words, vwords

    def finish_one(ci, chrom, params, ckp_name, codes, counts):
        total = int(counts.sum())
        logger.info(
            "Counted %s: %d distinct k-mers (count >= %d), %d total",
            chrom.name, codes.size, lower_count, total,
        )
        if checkpoint is not None:
            checkpoint.save(ckp_name, params, codes=codes, counts=counts,
                            total=total)
        results[ci] = ChromSpectrum(
            name=chrom.name, codes=codes, counts=counts, total=total
        )

    # sliding window of dispatched-but-uncollected chromosomes: compute for
    # chromosome N+1..N+W overlaps chromosome N's host download (the remote
    # tunnel makes downloads the e2e bottleneck; jax dispatch is async)
    window: deque = deque()
    PIPELINE_W = 3

    def collect_oldest():
        ci, chrom, params, ckp_name, handles, rebuild = window.popleft()
        codes, counts = count_codes_collect(handles, lower_count, rebuild)
        finish_one(ci, chrom, params, ckp_name, codes, counts)

    for ci, chrom in enumerate(genome.chroms):
        if nproc > 1 and not owns_chrom(ci):
            continue
        # keyed on the chromosome CONTENT (not the run's target set) so
        # re-running with a chromosome subset reuses every unchanged
        # spectrum — the reference's -re_filter workflow, where jellyfish
        # counts survive and only downstream steps recompute
        # (reference __main__.py:352-354, 415)
        params = {
            "k": k,
            "lower_count": lower_count,
            "chrom_sig": chrom.signature(),
        }
        ckp_name = f"spectrum.{chrom.name}"
        if checkpoint is not None and checkpoint.has(ckp_name, params):
            payload = checkpoint.load(ckp_name)
            results[ci] = ChromSpectrum(
                name=chrom.name,
                codes=payload["codes"],
                counts=payload["counts"],
                total=int(payload["total"]),
            )
            logger.info("Loaded spectrum checkpoint for %s", chrom.name)
            continue
        if counted_mbp == 0.0:
            meter.start()
        counted_mbp += chrom.length / 1e6
        tiles = [t for t in genome.tiles(k, tile_bases=tile_bases)
                 if t.chrom_index == ci]
        n_positions = len(tiles) * 16 * n_pos_words

        if mesh is not None and k <= 15 and mesh.shape.get("data", 1) > 1:
            from subphaser_tpu.parallel.sharded_count import sharded_spectrum

            while window:
                collect_oldest()
            codes64, counts64 = sharded_spectrum(mesh, tiles, k, n_pos_words)
            keep = counts64 >= lower_count
            logger.info("Counted %s on %d devices", chrom.name,
                        mesh.shape["data"])
            finish_one(ci, chrom, params, ckp_name, codes64[keep],
                       counts64[keep])
            continue

        # fast path: hold the chromosome's raw codes on device and run ONE
        # keys-only sort (per-batch RLE + pair merges re-sort every element
        # and carry counts through the sort for no benefit); pair codes
        # (k > 15) use two int32 arrays, so they fit half the budget
        fast = k <= 15 and n_positions <= device_budget
        fast_pair = k > 15 and n_positions <= device_budget // 2
        if fast:
            code_parts = [
                extract_codes_batch(w, v, k, n_pos_words)
                for w, v in batches_of(tiles)
            ]
            handles = count_codes_async(
                code_parts, lower_count, static_cap=1 << 23
            )
            del code_parts

            def rebuild(ci_local=ci):
                tiles2 = [t for t in genome.tiles(k, tile_bases=tile_bases)
                          if t.chrom_index == ci_local]
                return [extract_codes_batch(w, v, k, n_pos_words)
                        for w, v in batches_of(tiles2)]

            window.append((ci, chrom, params, ckp_name, handles, rebuild))
            while len(window) > PIPELINE_W:
                collect_oldest()
            continue

        if k <= 15:
            # accumulator path (chromosome exceeds the device budget):
            # per-batch count + device merges, then the SAME pipeline
            # window as the fast path so this chromosome's survivor
            # download overlaps the next chromosome's compute
            acc = SpectrumAccumulator(device_budget=device_budget)
            for words, vwords in batches_of(tiles):
                if words.ndim == 1:
                    u, c = count_tile(words, vwords, k, n_pos_words)
                else:
                    u, c = count_tile_batch(words, vwords, k, n_pos_words)
                acc.add(u, c)
            handles = acc.finish_async(lower_count)
            if handles is not None:
                window.append((ci, chrom, params, ckp_name, handles, None))
                while len(window) > PIPELINE_W:
                    collect_oldest()
                continue
            # host spills force the synchronous merge
            while window:
                collect_oldest()
            codes, counts = acc.finish(lower_count)
            finish_one(ci, chrom, params, ckp_name, codes, counts)
            continue

        while window:
            collect_oldest()
        if fast_pair:
            from subphaser_tpu.ops.count_pair import (
                count_pair_codes_threshold,
                extract_pair_codes_batch,
            )

            code_parts = [
                extract_pair_codes_batch(w, v, k, n_pos_words)
                for w, v in batches_of(tiles)
            ]
            codes, counts = count_pair_codes_threshold(code_parts, lower_count)
            finish_one(ci, chrom, params, ckp_name, codes, counts)
            continue
        from subphaser_tpu.ops.count_pair import (
            PairSpectrumAccumulator,
            count_tile_batch_pair,
        )

        acc = PairSpectrumAccumulator(device_budget=device_budget)
        for words, vwords in batches_of(tiles):
            hi, lo_, c = count_tile_batch_pair(words, vwords, k, n_pos_words)
            acc.add(hi, lo_, c)
        codes, counts = acc.finish(lower_count)
        finish_one(ci, chrom, params, ckp_name, codes, counts)

    while window:
        collect_oldest()
    if counted_mbp > 0:
        meter.stop(counted_mbp)
    if nproc > 1:
        from subphaser_tpu.parallel.distributed import exchange_chrom_spectra

        exchange_chrom_spectra(results, [c.name for c in genome.chroms])
    spectra = [results[ci] for ci in range(len(genome.chroms))]
    if meter.seconds > 0:
        meter.log()
    return spectra


@dataclass
class KmerMatrix:
    codes: np.ndarray    # int32 (B,) sorted candidate canonical codes
    counts: np.ndarray   # int32 (B, C)
    tot: np.ndarray      # int64 (B,) genome-wide totals
    lengths: np.ndarray  # int64 (C,) per-chromosome totals
    labels: list[str]
    freqs_override: np.ndarray | None = None  # set when loaded from a .mat file

    @property
    def freqs(self) -> np.ndarray:
        """Normalized frequencies count/chrom_total, float64 (matrix file values)."""
        if self.freqs_override is not None:
            return self.freqs_override
        return self.counts.astype(np.float64) / self.lengths.astype(np.float64)[None, :]


def build_matrix(
    spectra: list[ChromSpectrum],
    min_total: int | float = 1,
    max_total: int | float = float("inf"),
) -> KmerMatrix:
    """Assemble the chrom x k-mer count matrix for candidate k-mers.

    ``min_total``/``max_total`` pre-apply the reference's total-count window
    (Jellyfish.py:617) so the dense matrix only holds candidates. Pass
    ``min_total=1`` to keep everything (needed when the frequency histogram
    of all fold-passing k-mers is requested, Jellyfish.py:646-647).
    """
    lengths = np.array([s.total for s in spectra], dtype=np.int64)
    zero = [s.name for s in spectra if s.total == 0]
    if zero:
        raise ValueError(f"Chromosomes {zero} have only 0 kmers")
    all_codes, tot = merge_host([(s.codes, s.counts) for s in spectra])
    window = (tot >= min_total) & (tot <= max_total)
    cand = all_codes[window]
    cand_tot = tot[window]
    mat = np.zeros((cand.size, len(spectra)), dtype=np.int32)
    for j, s in enumerate(spectra):
        idx = np.searchsorted(cand, s.codes)
        idx_c = np.minimum(idx, max(cand.size - 1, 0))
        m = (idx < cand.size) & (cand.size > 0)
        if cand.size:
            m &= cand[idx_c] == s.codes
        mat[idx_c[m], j] = s.counts[m]
    logger.info(
        "Matrix: %d candidate k-mers (of %d distinct) x %d chromosomes",
        cand.size, all_codes.size, len(spectra),
    )
    return KmerMatrix(
        codes=cand,
        counts=mat,
        tot=cand_tot,
        lengths=lengths,
        labels=[s.name for s in spectra],
    )
