"""Multi-host runtime helpers.

The reference scales across machines with DRMAA array jobs that communicate
through the filesystem (reference RunCmdsMP.py:38-217). The TPU-native
equivalent is one jax.distributed job per host: every host loads and packs
only its assigned chromosomes/tiles, the sharded phase step
(parallel/phase_step.py) merges partial count matrices with psum over ICI,
and only rank 0 writes output files.

On a single machine this module degrades to no-ops (the same silent local
fallback the reference's grid path has, RunCmdsMP.py:533-535).
"""

from __future__ import annotations

import jax

from subphaser_tpu.utils.log import logger


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize jax.distributed if a coordinator is given.

    Returns (process_index, process_count).
    """
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def host_tile_slice(n_tiles: int) -> slice:
    """Contiguous tile range owned by this host (balanced split)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_tiles // n)
    return slice(p * per, min((p + 1) * per, n_tiles))


def allgather_spectrum(codes, counts, cap: int, lower_count: int = 1):
    """Merge per-process partial spectra into the global spectrum.

    Every process contributes a sorted sparse (codes, counts) over ITS tile
    slice; the arrays are padded to ``cap`` and exchanged with
    ``process_allgather`` (the collective replacement for the reference's
    parent-process dict merge of per-chromosome dump files,
    Jellyfish.py:446-458). The count threshold is applied only AFTER the
    global merge — a k-mer below ``lower_count`` on every host can still
    pass globally. Returns host (codes int32, counts int64), identical on
    all processes.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    from subphaser_tpu.ops.count import SENTINEL, merge_host

    codes = np.asarray(codes)
    counts = np.asarray(counts)
    if codes.size > cap:
        raise ValueError(f"local spectrum ({codes.size}) exceeds cap ({cap})")
    pc = np.full(cap, SENTINEL, np.int32)
    pn = np.zeros(cap, np.int64)
    pc[: codes.size] = codes
    pn[: codes.size] = counts
    gc = np.asarray(multihost_utils.process_allgather(pc))
    gn = np.asarray(multihost_utils.process_allgather(pn))
    parts = []
    for r in range(gc.shape[0]):
        m = gc[r] != SENTINEL
        parts.append((gc[r][m], gn[r][m]))
    mc, mn = merge_host(parts)
    keep = mn >= lower_count
    return mc[keep], mn[keep]
