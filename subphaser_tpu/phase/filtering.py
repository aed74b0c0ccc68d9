"""Streaming differential filter over the whole candidate k-mer space.

The reference pushes every k-mer through a process pool one tuple at a time
(reference Jellyfish.py:490-502); here candidates stream through the device
fold-vote kernel in large batches, and only differential rows are kept. The
frequency histogram samples (totals of all fold-passing k-mers regardless of
the count window, reference Jellyfish.py:646-647) fall out of the same pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from subphaser_tpu.ops.filter import GroupSpec, fold_votes_host, validate_baseline
from subphaser_tpu.phase.spectrum import ChromSpectrum, KmerMatrix
from subphaser_tpu.ops.count import merge_host
from subphaser_tpu.utils.log import logger


@dataclass
class FilterResult:
    matrix: KmerMatrix        # differential k-mers only
    fold_tots: np.ndarray     # totals of fold-passing k-mers (histogram data)
    n_candidates: int         # distinct k-mers examined
    n_differential: int


def chunk_counts(spectra: list[ChromSpectrum], cand: np.ndarray) -> np.ndarray:
    """(len(cand), n_chrom) int32 counts for the candidate codes."""
    mat = np.zeros((cand.size, len(spectra)), dtype=np.int32)
    for j, s in enumerate(spectra):
        if s.codes.size == 0 or cand.size == 0:
            continue
        idx = np.searchsorted(s.codes, cand)
        idx_c = np.minimum(idx, s.codes.size - 1)
        m = (idx < s.codes.size) & (s.codes[idx_c] == cand)
        mat[m, j] = s.counts[idx_c[m]]
    return mat


class _UnionCounts:
    """Chunked (cand, n_chrom) count-matrix builder over the sorted UNION.

    chunk_counts binary-searches every union code into every chromosome per
    chunk — O(n_chunks * n_chrom * chunk * log). Because ``all_codes`` is
    the union of the spectra, every spectrum code occurs in it EXACTLY once,
    so one searchsorted per chromosome gives each spectrum entry's row in
    the union; per chunk the rows in range are a contiguous slice (positions
    are sorted). This cuts the filter's matrix-build from ~n_chrom binary
    searches per union element to one per SPECTRUM element.
    """

    def __init__(self, spectra: list[ChromSpectrum], all_codes: np.ndarray):
        # all_codes may be a window-filtered SUBSET of the union, so keep
        # only spectrum entries that actually occur in it
        self.parts: list[tuple[np.ndarray, np.ndarray]] = []
        n = all_codes.size
        for s in spectra:
            if s.codes.size == 0 or n == 0:
                self.parts.append((np.empty(0, np.int64), np.empty(0, np.int32)))
                continue
            idx = np.searchsorted(all_codes, s.codes)
            idx_c = np.minimum(idx, n - 1)
            m = (idx < n) & (all_codes[idx_c] == s.codes)
            self.parts.append((idx[m], np.asarray(s.counts)[m].astype(np.int32)))

    def chunk(self, lo: int, hi: int) -> np.ndarray:
        # scatter into the transposed layout (contiguous per chromosome is
        # ~2x faster than strided row scatter), then one contiguous copy back
        matT = np.zeros((len(self.parts), hi - lo), dtype=np.int32)
        for j, (p, cnt) in enumerate(self.parts):
            a, b = np.searchsorted(p, [lo, hi])
            if b > a:
                matT[j, p[a:b] - lo] = cnt[a:b]
        return np.ascontiguousarray(matT.T)


def streaming_filter(
    spectra: list[ChromSpectrum],
    spec: GroupSpec,
    *,
    min_freq: float,
    max_freq: float,
    min_fold: float,
    ratio: float = 1.0,
    baseline: int = 1,
    by_count: bool = False,
    want_histogram: bool = True,
    chunk: int = 1 << 21,
) -> FilterResult:
    lengths = np.array([s.total for s in spectra], dtype=np.int64)
    zero = [s.name for s in spectra if s.total == 0]
    if zero:
        raise ValueError(f"Chromosomes {zero} have only 0 kmers")
    labels = [s.name for s in spectra]
    all_codes, tot = merge_host([(s.codes, s.counts) for s in spectra])
    n_cand = all_codes.size
    if not want_histogram:
        window = (tot >= min_freq) & (tot <= max_freq)
        all_codes, tot = all_codes[window], tot[window]

    validate_baseline(spec, baseline)
    uc = _UnionCounts(spectra, all_codes)
    diff_codes, diff_counts, diff_tots, fold_tots = [], [], [], []
    for lo in range(0, all_codes.size, chunk):
        cand = all_codes[lo : lo + chunk]
        ctot = tot[lo : lo + chunk]
        counts = uc.chunk(lo, lo + cand.size)
        # exact-parity gate: float64 on host (counts are host-resident here;
        # this also skips a ~128 MB/chunk upload through the device tunnel)
        fmask = fold_votes_host(
            counts,
            lengths,
            spec,
            min_fold=min_fold,
            ratio=ratio,
            baseline=baseline,
            by_count=by_count,
        )
        window = (ctot >= min_freq) & (ctot <= max_freq)
        dmask = fmask & window
        diff_codes.append(cand[dmask])
        diff_counts.append(counts[dmask])
        diff_tots.append(ctot[dmask])
        if want_histogram:
            fold_tots.append(ctot[fmask])

    codes = np.concatenate(diff_codes) if diff_codes else np.empty(0, np.int32)
    counts = (
        np.concatenate(diff_counts)
        if diff_counts
        else np.empty((0, len(spectra)), np.int32)
    )
    tots = np.concatenate(diff_tots) if diff_tots else np.empty(0, np.int64)
    hist = np.concatenate(fold_tots) if fold_tots else np.empty(0, np.int64)
    matrix = KmerMatrix(codes=codes, counts=counts, tot=tots, lengths=lengths, labels=labels)
    logger.info(
        "After filtering, remained %d (%.2f%%) differential (freq >= %s) and "
        "%d (%.2f%%) candidate (fold-passing) kmers",
        codes.size, 100.0 * codes.size / max(n_cand, 1), min_freq,
        hist.size, 100.0 * hist.size / max(n_cand, 1),
    )
    return FilterResult(
        matrix=matrix, fold_tots=hist, n_candidates=n_cand, n_differential=codes.size
    )
