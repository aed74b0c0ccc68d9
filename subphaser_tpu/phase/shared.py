"""Shared-feature identification via subgenome-level k-mer counts.

Native equivalent of the reference's (dormant) shared-LTR machinery
(reference Seqs.count_kmer:155-207, __main__.py:649-677): per-subgenome
k-mer spectra are built by merging chromosome spectra per SG; each feature
is then scored by summing the SG count vectors of its k-mers (both strands)
and kept as "shared" when coverage, depth, and balance pass:

- matched-position fraction >= min_prob
- min over SGs of (summed counts / matches) >= min_count
- max/min of length-normalized totals <= max_fold

Like the reference, this is not wired into the default pipeline (the
reference gates it behind ``if False:``); it is exposed for API users.
"""

from __future__ import annotations

import numpy as np

from subphaser_tpu.io.encoding import canonical_code, encode_bases
from subphaser_tpu.ops.count import merge_host
from subphaser_tpu.phase.spectrum import ChromSpectrum


def sg_spectra(
    spectra: list[ChromSpectrum],
    d_sg: dict[str, str],
    lower_count: int = 6,
) -> tuple[list[str], list[tuple[np.ndarray, np.ndarray]]]:
    """Merge chromosome spectra per subgenome; threshold at lower_count
    (the reference uses 2x the chromosome-level lower_count,
    __main__.py:659-660)."""
    groups: dict[str, list[ChromSpectrum]] = {}
    for s in spectra:
        sg = d_sg.get(s.name)
        if sg:
            groups.setdefault(sg, []).append(s)
    names = sorted(groups)
    merged = []
    for sg in names:
        codes, counts = merge_host([(s.codes, s.counts) for s in groups[sg]])
        keep = counts >= lower_count
        merged.append((codes[keep], counts[keep]))
    return names, merged


def _seq_kmer_codes(seq: str, k: int) -> np.ndarray:
    b = np.frombuffer(seq.upper().encode(), dtype=np.uint8)
    codes, valid = encode_bases(b)
    n = codes.shape[0] - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    c = codes.astype(np.int64)
    code = np.zeros(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    for j in range(k):
        code = (code << 2) | c[j : j + n]
        ok &= valid[j : j + n].astype(bool)
    code &= (1 << (2 * k)) - 1
    return code[ok]


def shared_features(
    records: list[tuple[str, str]],
    sg_names: list[str],
    spectra: list[tuple[np.ndarray, np.ndarray]],
    k: int,
    min_prob: float = 0.75,
    min_count: float = 10,
    max_fold: float = 1.05,
    exclude: dict | set | None = None,
) -> dict[str, np.ndarray]:
    """Feature id -> per-SG summed counts for features shared by all SGs."""
    exclude = exclude or set()
    lengths = np.array([c.sum() for _codes, c in spectra], dtype=np.float64)
    out: dict[str, np.ndarray] = {}
    for name, seq in records:
        if name in exclude:
            continue
        fwd = _seq_kmer_codes(seq, k)
        if fwd.size == 0:
            continue
        canon = canonical_code(fwd, k)
        sums = np.zeros(len(spectra), dtype=np.float64)
        matches = 0
        # both strands are scanned by the reference; canonical lookup covers
        # both in one pass since SG spectra are canonical
        for si, (codes, counts) in enumerate(spectra):
            idx = np.searchsorted(codes, canon)
            idx_c = np.minimum(idx, max(codes.size - 1, 0))
            hit = (idx < codes.size) & (codes[idx_c] == canon) if codes.size else np.zeros(canon.size, bool)
            sums[si] = counts[idx_c[hit]].sum()
            matches = max(matches, int(hit.sum()))
        # reference counts a position as matched when ANY SG has the k-mer;
        # it scans both strands so the ratio is vs 2x positions — canonical
        # lookup finds the same k-mers in one pass, so compare vs positions
        if matches / max(len(seq), 1) < min_prob / 2:
            continue
        if matches == 0 or (sums / max(matches, 1)).min() < min_count:
            continue
        ratios = np.sort(sums / lengths)
        if ratios[0] <= 0 or ratios[-1] / ratios[0] > max_fold:
            continue
        out[name] = sums
    return out
