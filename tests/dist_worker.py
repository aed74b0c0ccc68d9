"""Worker process for the 2-process jax.distributed test.

Each process owns a contiguous tile slice of a deterministic genome
(host_tile_slice), counts canonical k-mers over its slice only, and the
global spectrum is reconstructed with allgather_spectrum. Rank 0 writes the
merged result for the test to compare against a single-process oracle —
the multi-host analogue of the reference's per-chromosome jellyfish
processes + parent dict merge (Jellyfish.py:671-704, 446-458).

Usage: dist_worker.py <coordinator> <rank> <nproc> <outfile>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from subphaser_tpu.io.genome import PackedGenome  # noqa: E402
from subphaser_tpu.ops.count import (  # noqa: E402
    count_codes_threshold,
    extract_codes_batch,
)
from subphaser_tpu.parallel.distributed import (  # noqa: E402
    allgather_spectrum,
    host_tile_slice,
    init_distributed,
    is_primary,
)

K = 13
TILE_BASES = 1 << 10
LOWER = 3


def make_genome():
    rng = np.random.default_rng(42)
    seqs = {}
    rep = "".join(rng.choice(list("ACGT"), size=60))
    for i in range(3):
        s = list("".join(rng.choice(list("ACGT"), size=4 * TILE_BASES + 137)))
        for _ in range(30):
            p = rng.integers(0, len(s) - len(rep) - 1)
            s[p : p + len(rep)] = list(rep)
        seqs[f"c{i}"] = "".join(s)
    return PackedGenome.from_dict(seqs)


def main(coordinator: str, rank: int, nproc: int, outfile: str):
    pid, pcount = init_distributed(coordinator, nproc, rank)
    assert pcount == nproc, f"expected {nproc} processes, got {pcount}"
    assert jax.device_count() == nproc * jax.local_device_count()

    genome = make_genome()
    tiles = list(genome.tiles(K, tile_bases=TILE_BASES))
    mine = tiles[host_tile_slice(len(tiles))]
    # count locally with lower_count=1: the threshold must only be applied
    # to the globally merged counts
    parts = [
        extract_codes_batch(t.words, t.vwords, K, TILE_BASES // 16)
        for t in mine
    ]
    codes, counts = count_codes_threshold(parts, 1)
    gcodes, gcounts = allgather_spectrum(codes, counts, cap=1 << 18,
                                         lower_count=LOWER)
    if is_primary():
        np.savez(outfile, codes=gcodes, counts=gcounts)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
