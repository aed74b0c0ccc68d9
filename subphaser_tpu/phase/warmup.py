"""Compile warm-up overlapped with host-side FASTA packing.

Through the remote device tunnel the first dispatch of the big counting
program (the pow2-padded chromosome sort) costs minutes of compile, while
the pipeline's first minutes are pure host work (parsing + 2-bit packing).
This module scans the FASTA headers/lengths cheaply, predicts the exact
program shapes ``count_genome``'s fast path will dispatch, and compiles
them in a daemon thread so the compile runs *during* packing instead of
serializing after it. (The reference has no analogue: jellyfish is a
precompiled binary; here the "binary" is built by XLA at run time.)

Prediction must mirror phase/spectrum.count_genome exactly: per chromosome,
tiles = ceil(L / tile_bases), batches of ``batch_tiles`` (a lone trailing
tile is dispatched unstacked), concatenated codes padded to the next pow2.
A stale/missed prediction only costs a wasted compile; production falls
back to compiling on first dispatch as before.
"""

from __future__ import annotations

import threading

from subphaser_tpu.utils.log import logger


def plan_budgets(genome_size: int, tile_bases: int, low_mem, max_memory):
    """Shared budget policy -> (tile_bases, device_budget, low_mem, batch_tiles).

    Mirrors the reference's >3 Gb auto-low-memory switch
    (reference __main__.py:395-398) and scales device budgets to
    ``-max_memory``. Pure so the warm-up thread can predict the same
    choices the pipeline makes after packing.
    """
    device_budget = 1 << 28
    max_mem_bytes = parse_mem(max_memory)
    if max_mem_bytes and low_mem is None and genome_size * 3 > max_mem_bytes:
        low_mem = True
    if low_mem or (low_mem is None and genome_size > 3e9):
        tile_bases = min(tile_bases, 1 << 22)
        device_budget = 1 << 27
        low_mem = True
    if max_mem_bytes:
        cap = max(1 << 22, int(max_mem_bytes // 24))
        device_budget = min(device_budget, cap)
    batch_tiles = 4 if genome_size > 1e9 else 1
    return tile_bases, device_budget, low_mem, batch_tiles


def parse_mem(s) -> int | None:
    """'32G' / '512MB' / '2000000000' -> bytes (None when unset).

    Mirrors the reference's jellyfish-style memory strings (-max_memory,
    reference __main__.py:232-233 passing through to jellyfish/sort)."""
    if s is None:
        return None
    if isinstance(s, (int, float)):
        return int(s)
    s = str(s).strip().upper()
    mult = 1
    for suffix, m in (("TB", 1 << 40), ("T", 1 << 40), ("GB", 1 << 30),
                      ("G", 1 << 30), ("MB", 1 << 20), ("M", 1 << 20),
                      ("KB", 1 << 10), ("K", 1 << 10), ("B", 1)):
        if s.endswith(suffix):
            mult = m
            s = s[: -len(suffix)]
            break
    return int(float(s) * mult)


def scan_fasta_lengths(
    genome_files, prefixes=None, targets=None
) -> list[int]:
    """Sequence lengths of the chromosomes from_fasta_files would select.

    Same prefixed-or-raw id matching as PackedGenome.from_fasta_files
    (reference split_genomes selection, Seqs.py:27-71), but only counts
    bases — no packing, no python-level per-base work.
    """
    from subphaser_tpu.io.fasta import iter_fasta

    if prefixes is None:
        prefixes = [""] * len(genome_files)
    out: list[int] = []
    for path, prefix in zip(genome_files, prefixes):
        for rid, _desc, seq in iter_fasta(path):
            if targets and f"{prefix}{rid}" not in targets and rid not in targets:
                continue
            out.append(int(seq.shape[0]))
    return out


def predict_part_structures(
    lengths, tile_bases: int, batch_tiles: int, device_budget: int
) -> list[tuple[int, ...]]:
    """Exact code-part size tuples count_genome's fast path will dispatch.

    The concat+pad program is cached per part-size STRUCTURE (one N-ary
    concatenate, ops/count._concat_pow2), so warming must replicate the
    full tuple, not just the padded total."""
    structures = set()
    for L in lengths:
        if L <= 0:
            continue
        n_tiles = -(-L // tile_bases)
        n_positions = n_tiles * tile_bases
        if n_positions > device_budget:  # accumulator path, not warmed
            continue
        full, rem = divmod(n_tiles, batch_tiles)
        parts = [batch_tiles * tile_bases] * full
        if rem == 1:  # lone trailing tile is dispatched unstacked
            parts.append(tile_bases)
        elif rem > 1:  # padded to a full batch
            parts.append(batch_tiles * tile_bases)
        if parts:
            structures.add(tuple(parts))
    return sorted(structures)


def _warm(genome_files, prefixes, targets, k, tile_bases, low_mem, max_memory,
          lower_count, static_cap):
    import time

    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        from subphaser_tpu.io.genome import tile_words_for
        from subphaser_tpu.ops.count import (
            count_codes_async,
            extract_codes_batch,
        )
        from subphaser_tpu.ops.kmer import SENTINEL

        lengths = scan_fasta_lengths(genome_files, prefixes, targets)
        genome_size = sum(lengths)
        tile_bases, device_budget, _lm, batch_tiles = plan_budgets(
            genome_size, tile_bases, low_mem, max_memory
        )
        structures = predict_part_structures(
            lengths, tile_bases, batch_tiles, device_budget
        )
        if not structures:
            return
        n_words = tile_words_for(tile_bases, k)
        n_pos_words = tile_bases // 16
        # tile-code extraction programs (single-tile and stacked-batch)
        w1 = jnp.zeros(n_words, jnp.int32)
        extract_codes_batch(w1, w1, k, n_pos_words).block_until_ready()
        if batch_tiles > 1:
            wb = jnp.zeros((batch_tiles, n_words), jnp.int32)
            extract_codes_batch(wb, wb, k, n_pos_words).block_until_ready()
        # the big per-chromosome concat/sort/RLE/compact programs, one per
        # distinct part structure (each structure is its own concat program)
        for structure in structures:
            parts = [jnp.full(sz, SENTINEL, jnp.int32) for sz in structure]
            handles = count_codes_async(parts, lower_count, static_cap)
            handles[2].block_until_ready()
        logger.info(
            "Warm-compiled counting programs for %d part structure(s) "
            "(padded sizes %s) in %.0fs (overlapped with packing)",
            len(structures),
            sorted({1 << max(sum(s) - 1, 1).bit_length() for s in structures}),
            time.time() - t0,
        )
    except Exception as e:  # a missed warm-up must never break the run
        logger.debug("Compile warm-up skipped: %s", e)


def start_count_warmup(
    genome_files,
    prefixes,
    targets,
    k: int,
    tile_bases: int,
    low_mem,
    max_memory,
    lower_count: int,
    static_cap: int = 1 << 23,
    min_total_file_bytes: int = 256 << 20,
) -> threading.Thread | None:
    """Launch the warm-up daemon if it can plausibly pay for itself.

    Only for the single-device k<=15 fast path (the mesh path dispatches
    different programs), and only when the input is big enough that packing
    gives the compile something to hide behind.
    """
    import os

    if k > 15:
        return None
    try:
        total = sum(os.path.getsize(g) for g in genome_files)
    except OSError:
        return None
    if total < min_total_file_bytes:
        return None
    import jax

    if len(jax.devices()) > 1:
        return None
    t = threading.Thread(
        target=_warm,
        args=(genome_files, prefixes, targets, k, tile_bases, low_mem,
              max_memory, lower_count, static_cap),
        daemon=True,
        name="count-compile-warmup",
    )
    t.start()
    return t
