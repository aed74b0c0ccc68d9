import numpy as np
import pytest

from subphaser_tpu.io.encoding import kmer_code
from subphaser_tpu.io.genome import PackedGenome, tile_words_for
from subphaser_tpu.ops.kmer import SENTINEL, forward_codes, kmer_codes
from tests.oracle import canonical
from tests.test_encoding import random_seq


def codes_by_position(out, n_pos):
    """(16, W) offset-major device layout -> flat position order."""
    return np.asarray(out).T.reshape(-1)[:n_pos]


@pytest.mark.parametrize("k", [3, 11, 15])
def test_kmer_codes_oracle(k):
    rng = np.random.default_rng(k)
    seq = random_seq(rng, 700, n_frac=0.03)
    g = PackedGenome.from_dict({"c": seq})
    tile = next(g.tiles(k, tile_bases=1024))
    n_pos_words = 1024 // 16
    out = kmer_codes(tile.words, tile.vwords, k, n_pos_words)
    flat = codes_by_position(out, 1024)
    for i in range(1024):
        kmer = seq[i : i + k] if i + k <= len(seq) else ""
        if len(kmer) == k and all(c in "ACGT" for c in kmer.upper()):
            assert flat[i] == kmer_code(canonical(kmer)), f"pos {i}"
        else:
            assert flat[i] == SENTINEL, f"pos {i}"


@pytest.mark.parametrize("k", [5, 15])
def test_forward_codes_oracle(k):
    rng = np.random.default_rng(100 + k)
    seq = random_seq(rng, 500, n_frac=0.02)
    g = PackedGenome.from_dict({"c": seq})
    tile = next(g.tiles(k, tile_bases=512))
    out = forward_codes(tile.words, tile.vwords, k, 512 // 16)
    flat = codes_by_position(out, 512)
    for i in range(512):
        kmer = seq[i : i + k] if i + k <= len(seq) else ""
        if len(kmer) == k and all(c in "ACGT" for c in kmer.upper()):
            assert flat[i] == kmer_code(kmer), f"pos {i}"
        else:
            assert flat[i] == SENTINEL, f"pos {i}"


def test_tile_halo_covers_boundary():
    """k-mers spanning a tile boundary are produced exactly once."""
    k = 15
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 3000)
    g = PackedGenome.from_dict({"c": seq})
    tiles = list(g.tiles(k, tile_bases=1024))
    assert len(tiles) == 3
    seen = {}
    for t in tiles:
        out = kmer_codes(t.words, t.vwords, k, 1024 // 16)
        flat = codes_by_position(out, 1024)
        for i, c in enumerate(flat):
            pos = t.start + i
            if c != SENTINEL:
                assert pos not in seen
                seen[pos] = int(c)
    expected = {
        i: kmer_code(canonical(seq[i : i + k])) for i in range(len(seq) - k + 1)
    }
    assert seen == expected


def test_tile_words_shape():
    assert tile_words_for(1024, 15) == 1024 // 16 + 1
    assert tile_words_for(1024, 1) == 1024 // 16 + 1
    with pytest.raises(ValueError):
        tile_words_for(1000, 15)
