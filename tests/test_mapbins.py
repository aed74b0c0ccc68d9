import numpy as np

from subphaser_tpu.io.encoding import kmer_code
from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ops.kmer import SENTINEL
from subphaser_tpu.ops.mapbins import BinAccumulator, map_tile_bins, nbins_for_tile
from tests.oracle import map_kmers_to_bins, revcomp
from tests.test_encoding import random_seq


def test_map_tile_bins_oracle():
    k, bin_size, n_sg = 13, 100, 2
    rng = np.random.default_rng(5)
    seq = random_seq(rng, 3000, n_frac=0.01)
    # pick some k-mers present in the sequence as "significant"
    d_kmers = {}
    for pos in range(0, 2500, 37):
        kmer = seq[pos : pos + k]
        if "N" in kmer:
            continue
        sg = (pos // 500) % n_sg
        d_kmers[kmer] = sg
        d_kmers[revcomp(kmer)] = sg
    codes = np.array(sorted(kmer_code(s) for s in d_kmers), dtype=np.int32)
    sgs = np.array([d_kmers[s] for s in sorted(d_kmers, key=kmer_code)], dtype=np.int32)

    g = PackedGenome.from_dict({"c": seq})
    tile_bases = 1024
    nbt = nbins_for_tile(tile_bases, bin_size)
    acc = BinAccumulator([len(seq)], bin_size, n_sg)
    for t in g.tiles(k, tile_bases=tile_bases):
        bc, fb, hitmask = map_tile_bins(
            t.words, t.vwords, codes, sgs, np.int32(t.start),
            k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
            n_sg=n_sg, nbins_tile=nbt,
        )
        acc.add(t.chrom_index, bc, int(fb), hitmask)

    expected = map_kmers_to_bins(seq, d_kmers, k, bin_size, n_sg)
    got = acc.per_chrom[0]
    for b in range(got.shape[0]):
        exp = expected.get(b, [0] * n_sg)
        np.testing.assert_array_equal(got[b], exp, err_msg=f"bin {b}")
    # mapped k-mer identity bookkeeping
    expected_hit = {s for s in d_kmers if s in _all_substrings(seq, k)}
    assert acc.mapped_kmer_count == len({kmer_code(s) for s in expected_hit})
    assert acc.mapped_positions == sum(sum(v) for v in expected.values())


def _all_substrings(seq, k):
    su = seq.upper()
    return {su[i : i + k] for i in range(len(su) - k + 1)}


def test_map_tiles_batch_dense_oracle():
    """Dense-table mapping path vs the dict oracle (small k keeps the table tiny)."""
    import numpy as np
    from subphaser_tpu.ops.mapbins_dense import build_sig_table, map_tiles_batch_dense

    k, bin_size, n_sg = 11, 100, 2
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 2500, n_frac=0.01)
    d_kmers = {}
    for pos in range(0, 2000, 41):
        kmer = seq[pos : pos + k]
        if "N" in kmer:
            continue
        sg = (pos // 400) % n_sg
        d_kmers[kmer] = sg
        d_kmers[revcomp(kmer)] = sg
    codes = np.array(sorted(kmer_code(s) for s in d_kmers), dtype=np.int32)
    sgs = np.array([d_kmers[s] for s in sorted(d_kmers, key=kmer_code)], dtype=np.int32)
    table = build_sig_table(codes, sgs, k)

    g = PackedGenome.from_dict({"c": seq})
    tile_bases = 1024
    nbt = nbins_for_tile(tile_bases, bin_size)
    acc = BinAccumulator([len(seq)], bin_size, n_sg)
    for t in g.tiles(k, tile_bases=tile_bases):
        bcs, hm = map_tiles_batch_dense(
            t.words, t.vwords, table, sgs, np.int32(t.start),
            k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
            n_sg=n_sg, nbins_tile=nbt,
        )
        acc.add(t.chrom_index, np.asarray(bcs)[0], t.start // bin_size, hm)

    expected = map_kmers_to_bins(seq, d_kmers, k, bin_size, n_sg)
    got = acc.per_chrom[0]
    for b in range(got.shape[0]):
        np.testing.assert_array_equal(got[b], expected.get(b, [0] * n_sg),
                                      err_msg=f"bin {b}")
    hit = {s for s in d_kmers if s in _all_substrings(seq, k)}
    assert acc.mapped_kmer_count == len({kmer_code(s) for s in hit})


def test_map_tiles_batch_dense_batched_matches_single():
    """(T, n_words) batched dense mapping == per-tile calls (production uses
    batch=4 above 1 Gb); also cross-checks the searchsorted path."""
    import numpy as np
    from subphaser_tpu.ops.mapbins import map_tiles_batch
    from subphaser_tpu.ops.mapbins_dense import build_sig_table, map_tiles_batch_dense

    k, bin_size, n_sg = 11, 100, 3
    rng = np.random.default_rng(17)
    seq = random_seq(rng, 4 * 1024 + 700, n_frac=0.02)
    d_kmers = {}
    for pos in range(0, 4000, 23):
        kmer = seq[pos : pos + k]
        if "N" in kmer:
            continue
        sg = (pos // 300) % n_sg
        d_kmers[kmer] = sg
        d_kmers[revcomp(kmer)] = sg
    codes = np.array(sorted(kmer_code(s) for s in d_kmers), dtype=np.int32)
    sgs = np.array([d_kmers[s] for s in sorted(d_kmers, key=kmer_code)], dtype=np.int32)
    table = build_sig_table(codes, sgs, k)

    g = PackedGenome.from_dict({"c": seq})
    tile_bases = 1024
    nbt = nbins_for_tile(tile_bases, bin_size)
    tiles = list(g.tiles(k, tile_bases=tile_bases))
    words = np.stack([t.words for t in tiles])
    vwords = np.stack([t.vwords for t in tiles])
    starts = np.array([t.start for t in tiles], dtype=np.int32)

    bcs_b, hm_b = map_tiles_batch_dense(
        words, vwords, table, sgs, starts,
        k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
        n_sg=n_sg, nbins_tile=nbt,
    )
    from subphaser_tpu.ops.kmer import SENTINEL

    bcs_b, hm_b = np.asarray(bcs_b), np.asarray(hm_b)
    hit_union = set()
    for i, t in enumerate(tiles):
        bc1, hm1 = map_tiles_batch_dense(
            t.words, t.vwords, table, sgs, np.int32(t.start),
            k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
            n_sg=n_sg, nbins_tile=nbt,
        )
        np.testing.assert_array_equal(bcs_b[i], np.asarray(bc1)[0], err_msg=f"tile {i}")
        h = np.asarray(hm1)
        hit_union |= set(h[h != SENTINEL].tolist())
    got_hits = hm_b[hm_b != SENTINEL]
    assert sorted(hit_union) == got_hits.tolist()

    bcs_s, hm_s = map_tiles_batch(
        words, vwords, codes, sgs, starts,
        k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
        n_sg=n_sg, nbins_tile=nbt,
    )
    np.testing.assert_array_equal(bcs_b, np.asarray(bcs_s))
    hs = np.asarray(hm_s)
    # dense stores hit CODES (int8 sg table, round 4); searchsorted stores
    # sig INDICES — code <-> index is a bijection through the sorted codes
    np.testing.assert_array_equal(got_hits, codes[hs[hs != SENTINEL]])


def test_colsum_bins_match_contiguous():
    """The column-sum bin counter (aligned16 fast path) is byte-identical
    to the contiguous formulation for 16-aligned starts and 16-divisible
    bin sizes (the production configuration: bin 10000 = 625*16, pow2 tile
    starts)."""
    import jax.numpy as jnp

    from subphaser_tpu.ops.mapbins import (
        bin_counts_colsum,
        bin_counts_contiguous,
    )

    rng = np.random.default_rng(9)
    n_sg, bin_size = 3, 160
    W = 64  # 1024 positions
    nbt = (16 * W) // bin_size + 2
    hit = jnp.asarray(rng.random((16, W)) < 0.3)
    sg = jnp.asarray(rng.integers(0, n_sg, size=(16, W), dtype=np.int32))
    for start in (0, 16, 320, 480 + 160):
        a = bin_counts_contiguous(hit, sg, np.int32(start),
                                  bin_size=bin_size, n_sg=n_sg, nbins_tile=nbt)
        b = bin_counts_colsum(hit, sg, np.int32(start),
                              bin_size=bin_size, n_sg=n_sg, nbins_tile=nbt)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"start={start}")


def test_distinct_hits_dedup():
    """distinct_hits returns sorted unique values, SENTINEL-padded."""
    import jax.numpy as jnp

    from subphaser_tpu.ops.mapbins import distinct_hits

    vals = np.array([5, 3, 5, SENTINEL, 1, 3, 3, SENTINEL], dtype=np.int32)
    out = np.asarray(distinct_hits(jnp.asarray(vals), cap=8))
    assert out[:3].tolist() == [1, 3, 5]
    assert (out[3:] == SENTINEL).all()
