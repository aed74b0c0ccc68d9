"""Pair-code (k in [16, 30]) kernel tests against the python oracle."""

import numpy as np
import pytest

from subphaser_tpu.io.encoding import kmer_code
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ops.kmer import SENTINEL
from subphaser_tpu.ops.kmer_pair import (
    combine64,
    forward_codes_pair,
    kmer_codes_pair,
    split64,
)
from tests.oracle import canonical
from tests.test_encoding import random_seq


def flat64(hi, lo, n):
    h = np.asarray(hi).T.reshape(-1)[:n]
    l = np.asarray(lo).T.reshape(-1)[:n]
    return h, l


@pytest.mark.parametrize("k", [16, 17, 21, 27, 30, 31])
def test_pair_codes_oracle(k):
    rng = np.random.default_rng(k)
    seq = random_seq(rng, 800, n_frac=0.03)
    g = PackedGenome.from_dict({"c": seq})
    tile = next(g.tiles(k, tile_bases=512))
    hi, lo = kmer_codes_pair(tile.words, tile.vwords, k, 512 // 16)
    fh, fl = flat64(hi, lo, 512)
    hi2, lo2 = forward_codes_pair(tile.words, tile.vwords, k, 512 // 16)
    gh, gl = flat64(hi2, lo2, 512)
    for i in range(512):
        kmer = seq[i : i + k] if i + k <= len(seq) else ""
        if len(kmer) == k and all(c in "ACGT" for c in kmer.upper()):
            expect_c = kmer_code(canonical(kmer))
            expect_f = kmer_code(kmer)
            got_c = (int(fh[i]) << 31) | int(fl[i])
            got_f = (int(gh[i]) << 31) | int(gl[i])
            assert got_c == expect_c, f"canonical pos {i}"
            assert got_f == expect_f, f"forward pos {i}"
        else:
            assert fh[i] == SENTINEL, f"pos {i}"


def test_combine_split_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1 << 60, size=1000).astype(np.int64)
    hi, lo = split64(codes)
    np.testing.assert_array_equal(combine64(hi, lo), codes)


def test_k31_polyt_canonical_never_sentinel_hi():
    """k=31: canonical codes keep hi < SENTINEL even across poly-T runs
    (the canonicity argument in ops/kmer_pair's docstring), so counting's
    hi-only pad tests stay exact."""
    from subphaser_tpu.ops.kmer import SENTINEL

    k = 31
    rng = np.random.default_rng(5)
    seq = ("T" * 60 + random_seq(rng, 200, n_frac=0.0) + "T" * 40
           + "G" + "T" * 35 + random_seq(rng, 150, n_frac=0.0))
    seq = seq + random_seq(rng, 512 - len(seq) + 64, n_frac=0.0)
    g = PackedGenome.from_dict({"c": seq})
    tile = next(g.tiles(k, tile_bases=512))
    hi, lo = kmer_codes_pair(tile.words, tile.vwords, k, 512 // 16)
    fh, fl = flat64(hi, lo, 512)
    for i in range(512):
        kmer = seq[i : i + k] if i + k <= len(seq) else ""
        if len(kmer) == k and all(c in "ACGT" for c in kmer.upper()):
            assert fh[i] != SENTINEL or fl[i] != SENTINEL, f"pos {i}"
            expect = kmer_code(canonical(kmer))
            got = (int(fh[i]) << 31) | int(fl[i])
            assert got == expect, f"pos {i}"
            # the docstring's invariant: canonical hi is never all-ones
            assert fh[i] != SENTINEL, f"canonical hi==SENTINEL at {i}"
