import numpy as np
import pytest

from subphaser_tpu.io.encoding import codes_to_kmers, kmer_code
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ops.count import (
    SpectrumAccumulator,
    compact_host,
    count_tile,
    merge_host,
    sort_rle,
)
from subphaser_tpu.ops.kmer import SENTINEL
from tests.oracle import count_canonical_kmers
from tests.test_encoding import random_seq


def spectrum_to_dict(codes, counts, k):
    codes, counts = np.asarray(codes), np.asarray(counts)
    m = codes != SENTINEL
    return dict(zip(codes_to_kmers(codes[m], k).tolist(), counts[m].tolist()))


def test_sort_rle_simple():
    import jax.numpy as jnp

    codes = jnp.array([5, 3, 3, SENTINEL, 9, 3, 5, SENTINEL], dtype=jnp.int32)
    u, c = sort_rle(codes)
    u, c = np.asarray(u), np.asarray(c)
    m = u != SENTINEL
    np.testing.assert_array_equal(u[m], [3, 5, 9])
    np.testing.assert_array_equal(c[m], [3, 2, 1])


@pytest.mark.parametrize("k", [3, 15])
def test_count_tile_oracle(k):
    rng = np.random.default_rng(k)
    seq = random_seq(rng, 2000, n_frac=0.02)
    g = PackedGenome.from_dict({"c": seq})
    acc = {}
    for t in g.tiles(k, tile_bases=512):
        u, c = count_tile(t.words, t.vwords, k, 512 // 16)
        for kmer, n in spectrum_to_dict(u, c, k).items():
            acc[kmer] = acc.get(kmer, 0) + n
    assert acc == count_canonical_kmers(seq, k)


def test_accumulator_matches_oracle():
    k = 15
    rng = np.random.default_rng(42)
    # repetitive sequence so there are real duplicate k-mers
    unit = random_seq(rng, 300)
    seq = unit * 20 + random_seq(rng, 5000, n_frac=0.01)
    g = PackedGenome.from_dict({"c": seq})
    acc = SpectrumAccumulator(device_budget=1 << 14)
    for t in g.tiles(k, tile_bases=1024):
        u, c = count_tile(t.words, t.vwords, k, 1024 // 16)
        acc.add(u, c)
    codes, counts = acc.finish()
    got = dict(zip(codes_to_kmers(codes, k).tolist(), counts.tolist()))
    assert got == count_canonical_kmers(seq, k)
    assert np.all(np.diff(codes) > 0)


def test_count_codes_async_matches_threshold():
    import jax.numpy as jnp

    from subphaser_tpu.ops.count import (
        count_codes_async,
        count_codes_collect,
        count_codes_threshold,
    )

    rng = np.random.default_rng(7)
    parts = [
        jnp.asarray(rng.integers(0, 200, 3000, dtype=np.int32)),
        jnp.asarray(rng.integers(0, 200, 1500, dtype=np.int32)),
    ]
    for lower in (1, 2, 5):
        want_c, want_n = count_codes_threshold(parts, lower)
        got_c, got_n = count_codes_collect(
            count_codes_async(parts, lower, static_cap=1 << 12), lower
        )
        np.testing.assert_array_equal(got_c, want_c)
        np.testing.assert_array_equal(got_n, want_n)


def test_count_codes_async_overflow_recomputes():
    import jax.numpy as jnp

    from subphaser_tpu.ops.count import (
        count_codes_async,
        count_codes_collect,
        count_codes_threshold,
    )

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 5000, 6000, dtype=np.int32)
    parts = [jnp.asarray(arr)]
    want_c, want_n = count_codes_threshold(parts, 1)
    assert want_c.size > 64  # survivors overflow the tiny cap below
    handles = count_codes_async(parts, 1, static_cap=64)
    calls = []

    def rebuild():
        calls.append(1)
        return [jnp.asarray(arr)]

    got_c, got_n = count_codes_collect(handles, 1, rebuild)
    assert calls  # the exact-recompute fallback ran
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_n, want_n)
    # without a rebuild callback the overflow must be loud, not wrong
    with pytest.raises(RuntimeError):
        count_codes_collect(count_codes_async(parts, 1, static_cap=64), 1)


def test_count_codes_async_empty():
    from subphaser_tpu.ops.count import count_codes_async, count_codes_collect

    c, n = count_codes_collect(count_codes_async([], 1, static_cap=64), 1)
    assert c.size == 0 and n.size == 0


def test_merge_host_and_compact():
    a = np.array([2, 5, 9], dtype=np.int32), np.array([1, 2, 3], dtype=np.int64)
    b = np.array([5, 9, 11], dtype=np.int32), np.array([10, 1, 1], dtype=np.int64)
    codes, counts = merge_host([a, b])
    np.testing.assert_array_equal(codes, [2, 5, 9, 11])
    np.testing.assert_array_equal(counts, [1, 12, 4, 1])
    c, n = compact_host(
        np.array([1, SENTINEL], dtype=np.int32), np.array([5, 0], dtype=np.int64)
    )
    np.testing.assert_array_equal(c, [1])
