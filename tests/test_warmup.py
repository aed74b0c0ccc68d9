"""Compile warm-up: budget policy, FASTA scan, and shape prediction parity."""

import numpy as np
import pytest

from subphaser_tpu.phase import warmup


def test_parse_mem():
    assert warmup.parse_mem(None) is None
    assert warmup.parse_mem("1G") == 1 << 30
    assert warmup.parse_mem("512MB") == 512 << 20
    assert warmup.parse_mem("2T") == 2 << 40
    assert warmup.parse_mem(12345) == 12345


def test_plan_budgets_policy():
    t, b, lm, bt = warmup.plan_budgets(int(1e8), 1 << 23, None, None)
    assert (t, b, lm, bt) == (1 << 23, 1 << 28, None, 1)
    # >1 Gb turns on tile batching
    t, b, lm, bt = warmup.plan_budgets(int(2e9), 1 << 23, None, None)
    assert bt == 4 and b == 1 << 28
    # >3 Gb auto-low-memory: smaller tiles + budget
    t, b, lm, bt = warmup.plan_budgets(int(4e9), 1 << 23, None, None)
    assert (t, b, lm) == (1 << 22, 1 << 27, True)
    # -max_memory below 3x genome forces low-mem and caps the budget
    t, b, lm, bt = warmup.plan_budgets(int(1e9), 1 << 23, None, "1G")
    assert lm and t == 1 << 22 and b == max(1 << 22, (1 << 30) // 24)


def test_scan_matches_from_fasta(tmp_path):
    from subphaser_tpu.io.genome import PackedGenome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(0)
    fa = tmp_path / "g.fa"
    seqs = {f"chr{i}": random_seq(rng, 1000 + 700 * i) for i in range(3)}
    fa.write_text("".join(f">{n} desc\n{s}\n" for n, s in seqs.items()))
    targets = {"chr0": "A1", "chr2": "B1"}
    lengths = warmup.scan_fasta_lengths([str(fa)], [""], targets)
    genome, _ = PackedGenome.from_fasta_files([str(fa)], [""], targets)
    assert sorted(lengths) == sorted(c.length for c in genome.chroms)
    # no targets: everything
    assert warmup.scan_fasta_lengths([str(fa)]) == [
        len(s) for s in seqs.values()
    ]


@pytest.mark.parametrize("batch_tiles", [1, 4])
def test_predict_matches_dispatch(monkeypatch, batch_tiles):
    """predict_code_sizes == the pow2 sizes count_genome actually sorts."""
    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ops import count as count_mod
    from subphaser_tpu.phase.spectrum import count_genome
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(1)
    tile_bases = 1 << 10
    # lengths chosen to hit rem==0, rem==1, and rem>1 batch tails
    lengths = [tile_bases * 4, tile_bases * 5 - 17, tile_bases * 2 + 3, 900]
    genome = PackedGenome.from_dict(
        {f"c{i}": random_seq(rng, L) for i, L in enumerate(lengths)}
    )

    seen = []
    real = count_mod.count_codes_async

    def spy(code_parts, lower_count, static_cap):
        seen.append(tuple(int(p.size) for p in code_parts))
        return real(code_parts, lower_count, static_cap)

    monkeypatch.setattr(count_mod, "count_codes_async", spy)
    count_genome(genome, 13, lower_count=1, tile_bases=tile_bases,
                 batch_tiles=batch_tiles)
    predicted = warmup.predict_part_structures(
        [c.length for c in genome.chroms], tile_bases, batch_tiles, 1 << 28
    )
    assert sorted(set(seen)) == predicted


def test_warm_runs_to_completion(tmp_path):
    """_warm compiles the predicted programs without error (CPU)."""
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(3)
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{random_seq(rng, 40_000)}\n")
    warmup._warm([str(fa)], [""], None, 15, 1 << 10, None, None, 3, 1 << 12)


def test_start_warmup_smoke(tmp_path):
    from tests.test_encoding import random_seq

    rng = np.random.default_rng(2)
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{random_seq(rng, 5000)}\n")
    t = warmup.start_count_warmup(
        [str(fa)], [""], None, 15, 1 << 10, None, None, 1,
        min_total_file_bytes=0,
    )
    if t is not None:  # multi-device test env returns None
        t.join(timeout=120)
        assert not t.is_alive()
    # below the size gate: no thread
    assert (
        warmup.start_count_warmup(
            [str(fa)], [""], None, 15, 1 << 10, None, None, 1
        )
        is None
    )
