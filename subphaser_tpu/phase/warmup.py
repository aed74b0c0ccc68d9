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
    bases. Uses the zero-copy raw iterator + a vectorized newline count:
    the copying parser (split + strip per record) held the GIL for the
    whole genome and stalled the packing threads this warm-up is meant to
    overlap with.
    """
    import numpy as np

    from subphaser_tpu.io.fasta import iter_fasta_raw

    if prefixes is None:
        prefixes = [""] * len(genome_files)
    out: list[int] = []
    for path, prefix in zip(genome_files, prefixes):
        for rid, _desc, raw in iter_fasta_raw(path):
            if targets and f"{prefix}{rid}" not in targets and rid not in targets:
                continue
            nl = int(np.count_nonzero(raw == 10)) + int(np.count_nonzero(raw == 13))
            out.append(int(raw.shape[0]) - nl)
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
        import os

        import jax
        import jax.numpy as jnp
        import numpy as np

        from subphaser_tpu.io.genome import tile_words_for
        from subphaser_tpu.ops.count import count_codes_async, count_codes_collect, extract_codes_batch

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
        # SALT every input per process: the remote runtime caches repeated
        # identical executions, so a constant-filled warm-up is answered
        # from the server's execution cache WITHOUT loading/compiling the
        # program — and the first real chromosome then pays the ~minutes of
        # server-side program load this warm-up exists to hide (measured:
        # salted warm 1.9s steady vs 181s first real execution unsalted).
        salt = int.from_bytes(os.urandom(4), "little")
        n_words = tile_words_for(tile_bases, k)
        n_pos_words = tile_bases // 16
        rng = np.random.default_rng(salt)
        # tile-code extraction programs (single-tile and stacked-batch)
        w1 = rng.integers(0, 1 << 31, size=n_words, dtype=np.int32)
        extract_codes_batch(jnp.asarray(w1), jnp.asarray(w1), k,
                            n_pos_words).block_until_ready()
        if batch_tiles > 1:
            wb = rng.integers(0, 1 << 31, size=(batch_tiles, n_words),
                              dtype=np.int32)
            extract_codes_batch(jnp.asarray(wb), jnp.asarray(wb), k,
                                n_pos_words).block_until_ready()
        # the big per-chromosome concat/sort/RLE/compact programs, one per
        # distinct part structure (each structure is its own concat program).
        # Host-side salted fill (a device-side fill would add its own small
        # programs, each a fresh ~50s remote compile).
        biggest = max(sum(s) for s in structures)
        base = (np.arange(biggest, dtype=np.int64) * 2654435761 + salt) % (
            1 << 30
        )
        base = base.astype(np.int32)
        for structure in structures:
            ofs = 0
            parts = []
            for sz in structure:
                parts.append(jnp.asarray(base[ofs : ofs + sz]))
                ofs += sz
            handles = count_codes_async(parts, lower_count, static_cap)
            # collect end-to-end: also warms the download-window program.
            # Random warm data at low lower_count can overflow the static
            # cap (count_codes_collect would raise without rebuild_parts) —
            # the real programs are compiled either way, so just skip the
            # download-window warm for that structure.
            if int(handles[2]) <= static_cap:
                count_codes_collect(handles, lower_count)
        logger.info(
            "Warm-compiled counting programs for %d part structure(s) "
            "(padded sizes %s) in %.0fs (overlapped with packing)",
            len(structures),
            sorted({1 << max(sum(s) - 1, 1).bit_length() for s in structures}),
            time.time() - t0,
        )
    except Exception as e:  # a missed warm-up must never break the run
        logger.debug("Compile warm-up skipped: %s", e)


def pad_sig_pow2(codes, sgs):
    """Pow2-pad significant-kmer arrays (codes -> SENTINEL, sg -> 0).

    SENTINEL pad codes scatter out-of-bounds in the dense 4^k table
    (dropped) and sort last for searchsorted, so they never match a real
    forward code; the map program's shape then depends only on the pow2
    bucket of the sig count, keeping one compiled program per bucket."""
    import numpy as np

    from subphaser_tpu.ops.kmer import SENTINEL

    codes = np.ascontiguousarray(codes)
    sgs = np.ascontiguousarray(sgs)
    m = codes.shape[0]
    cap = 1 << max(m - 1, 1).bit_length()
    if cap > m:
        codes = np.concatenate([codes, np.full(cap - m, SENTINEL, codes.dtype)])
        sgs = np.concatenate([sgs, np.zeros(cap - m, sgs.dtype)])
    return codes, sgs


def start_map_warmup(
    codes, sgs, k: int, tile_bases: int, batch: int, n_sg: int,
    nbins_tile: int, bin_size: int, aligned16: bool = False,
):
    """Build the dense sig table and run one SALTED map batch in a thread.

    Launched as soon as the significant k-mer set is known, so the map
    program's remote compile overlaps the figure/file-writing phase
    instead of serializing in front of the mapping loop. The table it
    builds is the REAL table (from the padded sig codes) and is handed to
    the mapping step via ``join_map_warmup`` — no duplicate 4-GB table.
    """
    import threading as _threading

    holder: dict = {}

    def _run():
        import time

        t0 = time.time()
        try:
            import os

            import jax.numpy as jnp
            import numpy as np

            from subphaser_tpu.io.genome import tile_words_for
            from subphaser_tpu.ops.mapbins_dense import (
                build_sig_table,
                map_tiles_batch_dense,
            )

            salt = int.from_bytes(os.urandom(4), "little")
            rng = np.random.default_rng(salt)
            table = build_sig_table(jnp.asarray(codes), jnp.asarray(sgs), k)
            n_words = tile_words_for(tile_bases, k)
            shape = (batch, n_words) if batch > 1 else (n_words,)
            w = jnp.asarray(rng.integers(0, 1 << 31, size=shape, dtype=np.int32))
            v = jnp.asarray(rng.integers(0, 1 << 31, size=shape, dtype=np.int32))
            # 16-aligned salt start: the column-sum bin path (aligned16)
            # assumes aligned tile starts, and production starts are
            # multiples of the pow2 tile size anyway
            s0 = (salt % bin_size) & ~15
            starts = (
                jnp.zeros(batch, jnp.int32) + jnp.int32(s0)
                if batch > 1
                else jnp.int32(s0)
            )
            bcs, _hm = map_tiles_batch_dense(
                w, v, table, jnp.asarray(sgs), starts,
                k=k, n_pos_words=tile_bases // 16, bin_size=bin_size,
                n_sg=n_sg, nbins_tile=nbins_tile, aligned16=aligned16,
            )
            bcs.block_until_ready()
            holder["table"] = table
            logger.info(
                "Warm-compiled mapping program (m=%d, batch=%d) in %.0fs "
                "(overlapped with cluster/figures)",
                len(codes), batch, time.time() - t0,
            )
        except Exception as e:  # a missed warm-up must never break the run
            logger.debug("Map warm-up skipped: %s", e)

    t = _threading.Thread(target=_run, daemon=True, name="map-compile-warmup")
    t.start()
    holder["thread"] = t
    return holder


def join_map_warmup(warm, timeout: float = 600.0, grace: float = 600.0):
    """Wait for a map warm-up and return its sig table (None if it failed).

    If the thread is STILL RUNNING after ``timeout`` (very slow remote
    compile), wait one more bounded ``grace`` period rather than returning
    None immediately: the caller would build a second 4 GB device table
    while the warm thread holds the first — a device OOM at k=15. If it is
    STILL alive after the grace period, the thread is presumed wedged on a
    dead relay (the documented futex-hang failure mode) — abandon it and
    let the main path rebuild, accepting the transient duplicate-table
    memory risk over hanging the mapping step forever."""
    if warm is None:
        return None
    t = warm["thread"]
    t.join(timeout=timeout)
    if t.is_alive():
        logger.info("Map warm-up still compiling after %.0fs; waiting up to "
                    "%.0fs more", timeout, grace)
        t.join(timeout=grace)
        if t.is_alive():
            logger.warning(
                "Map warm-up wedged after %.0fs total (dead backend relay?); "
                "abandoning it and rebuilding the table on the main path",
                timeout + grace,
            )
            return None
    return warm.get("table")


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
