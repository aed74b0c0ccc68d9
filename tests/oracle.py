"""Pure-Python oracles reproducing the reference's algorithms for testing.

These intentionally mirror the reference's *behavior* (canonical k-mer
counting like jellyfish --canonical with -L, the per-k-mer differential
filter, forward-strand mapping with bin counts) in the simplest possible
Python so device kernels can be checked against them on small inputs.
"""

from __future__ import annotations

from collections import Counter, defaultdict

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s.upper()))


def canonical(s: str) -> str:
    rc = revcomp(s)
    return min(s.upper(), rc)


def count_canonical_kmers(seq: str, k: int, lower_count: int = 1) -> dict[str, int]:
    """jellyfish `count --canonical` + `dump -L lower_count` semantics."""
    seq = seq.upper()
    counts: Counter[str] = Counter()
    for i in range(len(seq) - k + 1):
        kmer = seq[i : i + k]
        if any(c not in "ACGT" for c in kmer):
            continue
        counts[canonical(kmer)] += 1
    return {s: c for s, c in counts.items() if c >= lower_count}


def filter_kmer(
    counts: list[int],
    lengths: list[float],
    sg_indices: list[list[list[int]]],
    *,
    min_freq: float,
    max_freq: float,
    min_fold: float,
    baseline: int = 1,
    ratio: float = 1.0,
    by_count: bool = False,
) -> tuple[bool, bool, int]:
    """Reference _filter_kmer (Jellyfish.py:611-648) -> (diff, fold_ok, tot)."""
    tot = sum(counts)
    include, n_all = 0, 0
    for sg in sg_indices:
        if len(sg) == 1:
            continue
        n_all += 1
        freqs = []
        for grp in sg:
            c = sum(counts[i] for i in grp)
            l = sum(lengths[i] for i in grp)
            freqs.append(c if by_count else c / l)
        freqs = sorted(freqs, reverse=True)
        if freqs[0] / (freqs[baseline] + 1e-20) >= min_fold:
            include += 1
    fold_ok = (include / n_all) >= ratio
    in_window = min_freq <= tot <= max_freq
    return fold_ok and in_window, fold_ok, tot


def sort_subgenomes(labels: list[int], chrs: list[str]) -> list[int]:
    """Reference Cluster.sort_subgenomes (Cluster.py:119-126)."""
    d_map: dict[int, int] = {}
    for label, _ in sorted(zip(labels, chrs), key=lambda x: x[1]):
        if label not in d_map:
            d_map[label] = max(d_map.values()) + 1 if d_map else 0
    return [d_map[l] for l in labels]


def map_kmers_to_bins(
    seq: str, d_kmers: dict[str, int], k: int, bin_size: int, n_sg: int
) -> dict[int, list[int]]:
    """Reference map_kmer_each4 (Seqs.py:209-237): forward-strand dict lookup."""
    seq = seq.upper()
    bins: dict[int, list[int]] = defaultdict(lambda: [0] * n_sg)
    for i in range(len(seq)):
        kmer = seq[i : i + k]
        if len(kmer) < k:
            break
        sg = d_kmers.get(kmer)
        if sg is None:
            continue
        bins[i // bin_size][sg] += 1
    return dict(bins)
