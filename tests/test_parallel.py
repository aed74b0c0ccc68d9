"""Multi-device sharded phasing step on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from subphaser_tpu.config import group_indices
from subphaser_tpu.io.genome import PackedGenome, tile_words_for
from subphaser_tpu.ops.filter import make_group_spec
from subphaser_tpu.ops.kmer import SENTINEL
from subphaser_tpu.parallel.mesh import make_mesh
from subphaser_tpu.parallel.phase_step import build_phase_step, shard_inputs
from tests.make_synthetic import make_genome

K = 15
TILE = 1 << 14


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("par")
    fa, cfg = make_genome(str(base), n_sets=2, chrom_size=60_000)
    from subphaser_tpu.config import SGConfig, build_targets, update_sgs
    from subphaser_tpu.phase.spectrum import count_genome

    c = SGConfig.parse(cfg)
    targets = build_targets(c.chrs)
    genome, _ = PackedGenome.from_fasta_files([fa], targets=targets)
    order = {n: i for i, n in enumerate(targets.values())}
    genome.chroms.sort(key=lambda x: order[x.name])
    labels = genome.names
    sgs = update_sgs(c.sgs, targets)
    spectra = count_genome(genome, K, lower_count=3, tile_bases=TILE)
    return genome, labels, sgs, spectra


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_phase_step_matches_host(setup, mesh_shape):
    genome, labels, sgs, spectra = setup
    from subphaser_tpu.ops.count import merge_host
    from subphaser_tpu.phase.filtering import streaming_filter

    # candidate table from the discovery pass
    all_codes, tot = merge_host([(s.codes, s.counts) for s in spectra])
    window = (tot >= 50) & (tot <= 1e9)
    cand = all_codes[window].astype(np.int32)
    lengths = np.array([s.total for s in spectra], dtype=np.float32)

    gi = group_indices(sgs, labels)
    spec = make_group_spec(gi, len(labels))

    tiles = list(genome.tiles(K, tile_bases=TILE))
    words = np.stack([t.words for t in tiles])
    vwords = np.stack([t.vwords for t in tiles])
    chrom_onehot = np.zeros((len(tiles), len(labels)), dtype=np.float32)
    for i, t in enumerate(tiles):
        chrom_onehot[i, t.chrom_index] = 1.0

    mesh = make_mesh(*mesh_shape)
    step = build_phase_step(
        mesh, k=K, n_pos_words=TILE // 16, n_clusters=2,
        min_freq=50, max_freq=1e9, min_fold=2.0,
    )
    order = np.argsort(labels).astype(np.int32)
    sharded = shard_inputs(
        mesh, words, vwords, chrom_onehot, cand,
        lengths, spec.member, spec.set_groups, spec.set_ncols,
        np.asarray(spec.set_valid), order,
    )
    key = jax.random.PRNGKey(0)
    labels_out, counts, diff = step(*sharded, key)
    labels_out = np.asarray(labels_out)
    counts = np.asarray(counts)
    diff = np.asarray(diff)

    # parity with the host path
    res = streaming_filter(
        spectra, spec, min_freq=50, max_freq=1e9, min_fold=2.0,
        want_histogram=False,
    )
    host_mat = res.matrix

    # counts on the padded candidate table match the host spectra
    cand_padded = np.asarray(sharded[3])
    valid = cand_padded != SENTINEL
    idx = np.searchsorted(host_mat.codes, cand_padded[valid])
    idx_c = np.minimum(idx, max(host_mat.codes.size - 1, 0))
    isdiff = (idx < host_mat.codes.size) & (host_mat.codes[idx_c] == cand_padded[valid])
    np.testing.assert_array_equal(diff[valid], isdiff)
    np.testing.assert_array_equal(
        counts[valid][isdiff], host_mat.counts[idx_c[isdiff]]
    )

    # subgenome split correct: A-chroms together, B-chroms together
    assign = dict(zip(labels, labels_out))
    a = {assign[c] for c in labels if c.startswith("A")}
    b = {assign[c] for c in labels if c.startswith("B")}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_pipeline_multi_vs_single_byte_identical(tmp_path):
    """Pipeline.run on the 8-device mesh writes byte-identical outputs to a
    forced single-device run (mesh counting + sharded mapping change only
    WHERE compute happens, never results)."""
    from tests.make_synthetic import make_genome
    from subphaser_tpu.phase.pipeline import Pipeline

    d = tmp_path / "gen"
    make_genome(str(d), n_sets=2, chrom_size=60_000)
    outs = {}
    for tag, ndev in (("multi", None), ("single", 1)):
        pipe = Pipeline(
            [str(d / "genome.fa.gz")], [str(d / "sg.config")],
            outdir=str(tmp_path / f"out_{tag}"),
            tmpdir=str(tmp_path / f"tmp_{tag}"),
            min_freq=40, replicates=10, tile_bases=1 << 16, figfmt="png",
            disable_ltr=True, disable_circos=True, window_size=40_000,
            seed=0, n_devices=ndev,
        )
        pipe.run()
        outs[tag] = tmp_path / f"out_{tag}"
        if tag == "multi":
            assert pipe.mesh is not None, "multi run did not build a mesh"
        else:
            assert pipe.mesh is None
    for name in ("k15_q40_f2.kmer.mat", "k15_q40_f2.chrom-subgenome.tsv",
                 "k15_q40_f2.subgenome.bin.count", "k15_q40_f2.bin.enrich"):
        a = (outs["multi"] / name).read_bytes()
        b = (outs["single"] / name).read_bytes()
        assert a == b, f"{name} differs between multi- and single-device runs"
