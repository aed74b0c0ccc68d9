"""Wheat-scale dress rehearsal (scaled down for CI): the >3 Gb low-memory
regime exercised end-to-end through count_genome with forced spills, plus a
peak-host-memory bound.

The reference flips to its low-memory path above 3 Gb (__main__.py:395-398);
here a 16 Mb chromosome runs with the same RATIO of device_budget to genome
size a 14 Gb wheat genome would see against the 2^27-entry low-mem budget
(14e9 / 2^27 ~ 104x over budget -> ~1.3e5-entry budget for 16 Mb), forcing
repeated pre-merges AND host spills through the exact code path.
"""

import resource

import numpy as np
import pytest

from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.phase.spectrum import count_genome


@pytest.fixture(scope="module")
def genome16():
    rng = np.random.default_rng(0)
    # repetitive chromosome: unique background + amplified repeat families
    n = 16 << 20
    arr = rng.integers(0, 4, size=n, dtype=np.int8)
    rep = rng.integers(0, 4, size=5000, dtype=np.int8)
    for _ in range(400):
        p = int(rng.integers(0, n - rep.size))
        arr[p : p + rep.size] = rep
    seq = np.frombuffer(b"ACGT", dtype=np.uint8)[arr].tobytes().decode()
    return PackedGenome.from_dict({"w1": seq})


def _count(genome, **kw):
    return count_genome(genome, k=15, lower_count=3, tile_bases=1 << 22,
                        batch_tiles=1, **kw)


def test_low_mem_spill_matches_big_budget(genome16):
    """Forced-spill counting (wheat-ratio budget) is exact vs the all-on-
    device path, and host RSS stays bounded."""
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    big = _count(genome16, device_budget=1 << 28)[0]

    small = _count(genome16, device_budget=1 << 17)[0]
    assert np.array_equal(big.codes, small.codes)
    assert np.array_equal(big.counts, small.counts)
    assert big.total == small.total
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # peak growth stays far below the genome's raw size (16 MB packed ->
    # any blow-up past ~2 GB means the spill path is materializing
    # full-genome intermediates)
    growth_mb = (rss1 - rss0) / 1024
    assert growth_mb < 2048, f"peak RSS grew {growth_mb:.0f} MB"


def test_spill_actually_happened(genome16, caplog):
    """The wheat-ratio budget must exercise the spill path, not sneak
    through the fast path."""
    from subphaser_tpu.ops.count import SpectrumAccumulator

    calls = {"spills": 0}
    orig = SpectrumAccumulator.add

    def traced_add(self, codes, counts):
        orig(self, codes, counts)
        calls["spills"] = max(calls["spills"], len(self.spilled))

    SpectrumAccumulator.add = traced_add
    try:
        _count(genome16, device_budget=1 << 17)
    finally:
        SpectrumAccumulator.add = orig
    assert calls["spills"] >= 1, "tiny budget did not spill to host"
