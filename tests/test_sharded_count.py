"""Sharded spectrum discovery (all_to_all k-mer-range exchange) vs oracle."""

import numpy as np

from subphaser_tpu.io.encoding import codes_to_kmers
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.parallel.mesh import make_mesh
from subphaser_tpu.parallel.sharded_count import sharded_spectrum
from tests.oracle import count_canonical_kmers
from tests.test_encoding import random_seq

K = 15
TILE = 1 << 12


def test_sharded_spectrum_matches_oracle():
    rng = np.random.default_rng(0)
    unit = random_seq(rng, 200)
    seq = unit * 10 + random_seq(rng, 8 * TILE, n_frac=0.01)
    genome = PackedGenome.from_dict({"c": seq})
    tiles = list(genome.tiles(K, tile_bases=TILE))
    mesh = make_mesh(8, 1)
    # flatten the 2-D mesh to the 1-D data axis the counter expects
    from jax.sharding import Mesh

    mesh1 = Mesh(np.array(mesh.devices).reshape(-1), ("data",))
    codes, counts = sharded_spectrum(mesh1, tiles, K, TILE // 16)
    got = dict(zip(codes_to_kmers(codes, K).tolist(), counts.tolist()))
    assert got == count_canonical_kmers(seq, K)
    assert np.all(np.diff(codes) > 0)


def test_sharded_spectrum_uneven_tiles():
    rng = np.random.default_rng(1)
    seq = random_seq(rng, 5 * TILE + 321)  # 6 tiles, padded to 8 devices
    genome = PackedGenome.from_dict({"c": seq})
    tiles = list(genome.tiles(K, tile_bases=TILE))
    from jax.sharding import Mesh
    import jax

    mesh1 = Mesh(np.array(jax.devices()[:8]), ("data",))
    codes, counts = sharded_spectrum(mesh1, tiles, K, TILE // 16)
    got = dict(zip(codes_to_kmers(codes, K).tolist(), counts.tolist()))
    assert got == count_canonical_kmers(seq, K)
