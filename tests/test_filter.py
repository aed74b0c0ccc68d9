import numpy as np
import pytest

from subphaser_tpu.ops.filter import differential_filter, make_group_spec
from tests.oracle import filter_kmer


def random_case(rng, n_chrom=6, n_kmers=500):
    counts = rng.integers(0, 50, size=(n_kmers, n_chrom)).astype(np.int32)
    # make some rows strongly differential
    counts[: n_kmers // 4, 0] += 500
    counts[n_kmers // 4 : n_kmers // 2, 3] += 300
    lengths = rng.integers(10000, 20000, size=n_chrom).astype(np.float64)
    return counts, lengths


@pytest.mark.parametrize("baseline", [1, -1])
@pytest.mark.parametrize("by_count", [False, True])
def test_filter_matches_oracle(baseline, by_count):
    rng = np.random.default_rng(0)
    counts, lengths = random_case(rng)
    # 2 sets x 2 columns, one multi-chrom group, one singleton set (ignored)
    sg_indices = [[[0], [3]], [[1, 2], [4]], [[5]]]
    spec = make_group_spec(sg_indices, 6)
    kwargs = dict(min_freq=300, max_freq=1500, min_fold=1.4, ratio=0.5)
    diff, fold, tot = differential_filter(
        counts,
        lengths.astype(np.float32),
        spec.member,
        spec.set_groups,
        spec.set_ncols,
        spec.set_valid,
        baseline=baseline,
        by_count=by_count,
        **kwargs,
    )
    diff, fold, tot = np.asarray(diff), np.asarray(fold), np.asarray(tot)
    for i in range(counts.shape[0]):
        ediff, efold, etot = filter_kmer(
            counts[i].tolist(),
            lengths.tolist(),
            sg_indices,
            baseline=baseline,
            by_count=by_count,
            **kwargs,
        )
        assert tot[i] == etot
        assert fold[i] == efold, f"row {i}"
        assert diff[i] == ediff, f"row {i}"


def test_all_singletons_raises():
    with pytest.raises(ValueError):
        make_group_spec([[[0]], [[1]]], 2)


@pytest.mark.parametrize("baseline", [1, -1])
@pytest.mark.parametrize("by_count", [False, True])
def test_host_gate_matches_oracle(baseline, by_count):
    """fold_votes_host (the exact-parity float64 file-output gate)."""
    from subphaser_tpu.ops.filter import fold_votes_host

    rng = np.random.default_rng(1)
    counts, lengths = random_case(rng)
    sg_indices = [[[0], [3]], [[1, 2], [4]], [[5]]]
    spec = make_group_spec(sg_indices, 6)
    mask = fold_votes_host(
        counts, lengths, spec,
        min_fold=1.4, ratio=0.5, baseline=baseline, by_count=by_count,
    )
    for i in range(counts.shape[0]):
        _, efold, _ = filter_kmer(
            counts[i].tolist(), lengths.tolist(), sg_indices,
            min_freq=0, max_freq=1 << 40, min_fold=1.4, ratio=0.5,
            baseline=baseline, by_count=by_count,
        )
        assert mask[i] == efold, f"row {i}"


def test_baseline_out_of_range_raises():
    from subphaser_tpu.ops.filter import fold_votes_host, validate_baseline

    spec = make_group_spec([[[0], [1]], [[2], [3], [4]]], 5)
    validate_baseline(spec, 1)
    validate_baseline(spec, -2)
    for bad in (2, 3, -3, 5):
        with pytest.raises(ValueError, match="baseline"):
            validate_baseline(spec, bad)
    with pytest.raises(ValueError, match="baseline"):
        fold_votes_host(
            np.ones((4, 5), np.int32), np.ones(5), spec,
            min_fold=2.0, ratio=0.5, baseline=2,
        )


def test_union_counts_window_filtered_subset():
    """_UnionCounts must handle all_codes that is a SUBSET of the union
    (the want_histogram=False path pre-filters by the frequency window)."""
    import numpy as np

    from subphaser_tpu.phase.filtering import _UnionCounts, chunk_counts
    from subphaser_tpu.phase.spectrum import ChromSpectrum

    rng = np.random.default_rng(3)
    spectra = []
    for j in range(5):
        codes = np.unique(rng.integers(0, 5000, 800).astype(np.int32))
        counts = rng.integers(1, 9, codes.size).astype(np.int64)
        spectra.append(
            ChromSpectrum(name=f"c{j}", codes=codes, counts=counts,
                          total=int(counts.sum()))
        )
    from subphaser_tpu.ops.count import merge_host

    union, tot = merge_host([(s.codes, s.counts) for s in spectra])
    keep = (tot >= 3) & (tot <= 20)  # frequency window
    sub = union[keep]
    uc = _UnionCounts(spectra, sub)
    for lo in range(0, sub.size, 300):
        hi = min(lo + 300, sub.size)
        np.testing.assert_array_equal(
            uc.chunk(lo, hi), chunk_counts(spectra, sub[lo:hi])
        )


def test_hitset_dedup_and_consolidation():
    import numpy as np

    from subphaser_tpu.ops.kmer import SENTINEL
    from subphaser_tpu.ops.mapbins import HitSet

    rng = np.random.default_rng(4)
    hs = HitSet(budget=256)  # tiny budget forces consolidation
    truth = set()
    for _ in range(20):
        vals = rng.integers(0, 500, 64).astype(np.int32)
        miss = rng.random(64) < 0.3
        vals[miss] = SENTINEL
        arr = np.sort(np.unique(vals))
        pad = np.full(128 - arr.size, SENTINEL, np.int32)
        hs.add(np.concatenate([arr, pad]))
        truth |= set(int(v) for v in vals[~miss])
    assert hs.count() == len(truth)
    assert hs.count() == len(truth)  # idempotent
