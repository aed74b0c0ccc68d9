"""Device mesh construction for multi-chip phasing.

Axes:
- "data": genome tiles (data parallel; replaces the reference's
  per-chromosome process pool, reference RunCmdsMP.py / Jellyfish.py:671-676)
- "kmer": candidate k-mer table sharding (model/tensor-parallel axis; replaces
  the reference's host dict merge, Jellyfish.py:446-458)

Partial chrom x k-mer count matrices merge with psum over "data" and stay
sharded over "kmer"; clustering runs feature-sharded with psum'd distances.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_kmer: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_kmer
    need = n_data * n_kmer
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_kmer} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_kmer)
    return Mesh(arr, ("data", "kmer"))
