"""VMEM bitonic sort: interpret-mode correctness on CPU (the hardware path
is exercised by tools/bench_vmem_sort.py on the chip; bit-exactness vs
np.sort was verified there at 2^18/2^22/2^25)."""

import numpy as np
import pytest

from subphaser_tpu.ops import sort_vmem


def test_supports_gating():
    # CPU backend in tests: the production gate must refuse
    assert not sort_vmem.supports(1 << 18)


@pytest.mark.parametrize("n", [1 << 18, 1 << 19])
def test_interpret_correctness(n):
    import jax
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(n)
    x = rng.integers(0, 1 << 30, size=n, dtype=np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sort_vmem.vmem_sort(jax.numpy.asarray(x)))
    assert np.array_equal(got, np.sort(x))


def test_interpret_with_sentinel_padding():
    """SENTINEL-padded input (the counting path's pow2 padding) sorts with
    the sentinels trailing."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from subphaser_tpu.ops.kmer import SENTINEL

    rng = np.random.default_rng(3)
    n = 1 << 18
    x = rng.integers(0, 1 << 30, size=n, dtype=np.int32)
    x[n // 2 :] = SENTINEL
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sort_vmem.vmem_sort(jax.numpy.asarray(x)))
    assert np.array_equal(got, np.sort(x))
    assert got[-1] == SENTINEL

def test_size_validation():
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        sort_vmem.vmem_sort(jnp.zeros(100, jnp.int32))
