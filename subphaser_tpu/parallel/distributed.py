"""Multi-host runtime helpers.

The reference scales across machines with DRMAA array jobs that communicate
through the filesystem (reference RunCmdsMP.py:38-217). The TPU-native
equivalent is one jax.distributed job per host: every host loads and packs
only its assigned chromosomes/tiles, the sharded phase step
(parallel/phase_step.py) merges partial count matrices with psum over ICI,
and only rank 0 writes output files.

On a single machine this module degrades to no-ops (the same silent local
fallback the reference's grid path has, RunCmdsMP.py:533-535).

Rank-failure policy: a dead or hung rank leaves the survivors blocked in
the allgather (the collective has no notion of a missing participant), so
every exchange in this module runs under a watchdog — if the collective
has not completed within ``SUBPHASER_COLLECTIVE_TIMEOUT`` seconds
(default 1800; 0 disables), the survivor logs the failed exchange and
hard-exits with code 17. The recovery action is to RESTART THE WHOLE JOB:
every phase that feeds an exchange is checkpointed (spectra, map bins,
per-chromosome .scn parts, classification chunk streams, per-pair PAFs),
so the restarted job replays only the work the dead rank never finished.
This is the collective-runtime equivalent of the reference grid's
retry-failed-jobs-and-resume-from-.completed loop (RunCmdsMP.py:173-217,
398-416): the retry unit here is the job, not the task, because a lost
jax.distributed rank cannot rejoin a live ring.
"""

from __future__ import annotations

import contextlib
import os
import threading

import jax

from subphaser_tpu.utils.log import logger

COLLECTIVE_TIMEOUT_ENV = "SUBPHASER_COLLECTIVE_TIMEOUT"


@contextlib.contextmanager
def _collective_watchdog(label: str):
    """Hard-exit (code 17) if a collective blocks past the deadline.

    The allgather blocks inside the runtime where Python signals cannot
    interrupt it, so the watchdog is a daemon timer + os._exit — loud and
    immediate, instead of the survivors wedging forever on a dead peer."""
    seconds = float(os.environ.get(COLLECTIVE_TIMEOUT_ENV, "1800"))
    if seconds <= 0:
        yield
        return

    def _boom():
        logger.error(
            "collective '%s' did not complete within %.0fs on rank %d/%d "
            "— a peer rank is dead or hung. Exiting 17; restart the job "
            "(checkpoints resume the finished work).",
            label, seconds, jax.process_index(), jax.process_count(),
        )
        os._exit(17)

    t = threading.Timer(seconds, _boom)
    t.daemon = True
    t.start()
    try:
        yield
    finally:
        t.cancel()


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


def owns_chrom(ci: int) -> bool:
    """Round-robin chromosome ownership for multi-process counting."""
    return ci % jax.process_count() == jax.process_index()


def exchange_chrom_spectra(results: dict, chrom_names: list[str]):
    """Fill per-chromosome spectra counted on OTHER processes.

    Each process counted only the chromosomes it owns (owns_chrom); the
    full (codes, counts, total) spectra are exchanged with one padded
    process_allgather per field so every process ends with the complete,
    identical set — the collective replacement for the reference's
    per-array-job dump files merged by the parent (RunCmdsMP.py:38-217,
    Jellyfish.py:446-458). Pads to the global max spectrum size, so this
    targets multi-host scale-out of the COUNTING phase; the exchanged
    spectra are the post-threshold survivors (small next to raw counts).

    ``results`` maps chrom index -> ChromSpectrum for owned chromosomes
    and is completed in place.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    from subphaser_tpu.phase.spectrum import ChromSpectrum

    n = len(chrom_names)
    sizes = np.zeros(n, np.int64)
    totals = np.zeros(n, np.int64)
    for ci, s in results.items():
        sizes[ci] = s.codes.size
        totals[ci] = s.total
    with _collective_watchdog("exchange_chrom_spectra"):
        g_sizes = np.asarray(multihost_utils.process_allgather(sizes)).max(axis=0)
        g_totals = np.asarray(multihost_utils.process_allgather(totals)).max(axis=0)
        cap = max(int(g_sizes.max()), 1)
        pc = np.zeros((n, cap), np.int32)
        pn = np.zeros((n, cap), np.int64)
        for ci, s in results.items():
            pc[ci, : s.codes.size] = s.codes
            pn[ci, : s.codes.size] = s.counts
        gc = np.asarray(multihost_utils.process_allgather(pc))
        gn = np.asarray(multihost_utils.process_allgather(pn))
    nproc = jax.process_count()
    for ci in range(n):
        if ci in results:
            continue
        owner = ci % nproc
        m = int(g_sizes[ci])
        results[ci] = ChromSpectrum(
            name=chrom_names[ci],
            codes=gc[owner, ci, :m].copy(),
            counts=gn[owner, ci, :m].copy(),
            total=int(g_totals[ci]),
        )


def exchange_blobs(blobs: dict[int, bytes], n_items: int) -> dict[int, bytes]:
    """Exchange per-item byte payloads across processes.

    Each process contributes the items it owns (``owns_chrom``-style
    round-robin: item ``i`` belongs to process ``i % process_count``);
    after one padded uint8 allgather every process holds ALL items. This is
    the generic payload collective behind sharded mapping bins, LTR .scn
    records, classification tables and block PAFs — the reference moves
    the same payloads through per-array-job dump files merged by the
    parent (RunCmdsMP.py:38-217).
    """
    import numpy as np
    from jax.experimental import multihost_utils

    sizes = np.zeros(n_items, np.int64)
    for i, b in blobs.items():
        sizes[i] = len(b)
    with _collective_watchdog("exchange_blobs"):
        g_sizes = np.asarray(multihost_utils.process_allgather(sizes)).max(axis=0)
        cap = max(int(g_sizes.max()), 1)
        buf = np.zeros((n_items, cap), np.uint8)
        for i, b in blobs.items():
            buf[i, : len(b)] = np.frombuffer(b, np.uint8)
        g = np.asarray(multihost_utils.process_allgather(buf))
    nproc = jax.process_count()
    out: dict[int, bytes] = {}
    for i in range(n_items):
        owner = i % nproc
        out[i] = g[owner, i, : int(g_sizes[i])].tobytes()
    return out


def exchange_arrays(arrs: dict[int, dict], n_items: int) -> dict[int, dict]:
    """exchange_blobs for dicts of numpy arrays (npz-encoded payloads)."""
    import io

    import numpy as np

    blobs = {}
    for i, d in arrs.items():
        bio = io.BytesIO()
        np.savez(bio, **d)
        blobs[i] = bio.getvalue()
    out = {}
    for i, b in exchange_blobs(blobs, n_items).items():
        with np.load(io.BytesIO(b)) as z:
            out[i] = {k: z[k] for k in z.files}
    return out


def shard_indices(n: int) -> list[int]:
    """Item indices owned by this process (round-robin, owns_chrom rule)."""
    return list(range(jax.process_index(), n, jax.process_count()))


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
    with _collective_watchdog("allgather_spectrum"):
        gc = np.asarray(multihost_utils.process_allgather(pc))
        gn = np.asarray(multihost_utils.process_allgather(pn))
    parts = []
    for r in range(gc.shape[0]):
        m = gc[r] != SENTINEL
        parts.append((gc[r][m], gn[r][m]))
    mc, mn = merge_host(parts)
    keep = mn >= lower_count
    return mc[keep], mn[keep]
