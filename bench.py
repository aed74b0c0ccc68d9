"""Benchmark: canonical k-mer counting throughput (Mbp/s) on one chip.

Prints ONE JSON line:
  {"metric": "kmer_count_throughput", "value": N, "unit": "Mbp/s",
   "vs_baseline": N}

vs_baseline compares against a single-thread numpy implementation of the
same exact pipeline (2-bit decode -> canonical codes -> sort -> RLE) on the
host CPU — a stand-in for the jellyfish-class CPU path the reference shells
out to (reference Jellyfish.py:697-703), measured on this machine.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _start_watchdog(seconds: float = 1800.0):
    """Hard-exit with a diagnostic if the bench never completes.

    A dead axon relay leaves the first device op blocked in a futex that
    ignores SIGTERM (observed 2026-08-17: port 127.0.0.1:8103 closed for
    hours; every client hung). Legitimate first compiles through the
    tunnel are <= ~530 s, so 30 min without finishing means the backend
    is gone — fail loudly instead of wedging the driver."""
    import os
    import threading

    def _boom():
        log(f"bench watchdog: no result after {seconds:.0f}s — "
            "axon backend unreachable (check 127.0.0.1:8103); aborting")
        os._exit(3)

    t = threading.Timer(seconds, _boom)
    t.daemon = True
    t.start()
    return t


K = 15
TILE_BASES = 1 << 23  # 8.4 Mbp per tile
N_TILES = 4           # batch per timed step
WARMUP = 2
ITERS = 5


def make_tiles(rng):
    """Random packed tiles (uniform bases, all valid): worst case for sort."""
    from subphaser_tpu.io.genome import tile_words_for

    n_words = tile_words_for(TILE_BASES, K)
    words = rng.integers(0, 2**32, size=(N_TILES, n_words), dtype=np.uint32).astype(
        np.int32
    )
    vwords = np.full((N_TILES, n_words), np.uint32(0xFFFF), dtype=np.uint32).astype(
        np.int32
    )
    return words, vwords


def bench_tpu(words, vwords):
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.count import count_tile
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    n_pos_words = TILE_BASES // 16
    CAP = 1 << 22  # generous survivor cap (lower_count=2 on random tiles)

    @jax.jit
    def step(ws, vs, salt):
        # the PRODUCTION per-chromosome path (phase/spectrum.count_genome
        # fast path): per-tile canonical codes -> ONE keys-only sort over
        # the batch -> gather-free scan RLE -> right-sized compaction.
        # salt inside the jit (the axon runtime caches repeated identical
        # executions); POSITION-weighted checksum (sum(code*count)
        # telescopes to sum(codes) and lets XLA eliminate the whole sort)
        from subphaser_tpu.ops.count import (
            _compact_survivors,
            _sorted_run_survivors,
        )
        from subphaser_tpu.ops.kmer import kmer_codes

        def one(wv):
            return kmer_codes(wv[0] ^ salt, wv[1], K, n_pos_words).reshape(-1)

        codes = jax.lax.map(one, (ws, vs)).reshape(-1)
        s = jnp.sort(codes)
        keep, runlen, _m = _sorted_run_survivors(s, 2)
        u, c = _compact_survivors(s, keep, runlen, CAP)
        # position-weighted checksum; iota built IN the jit (a closed-over
        # host arange is baked into the program as a constant — at 2^27
        # that is a 0.5 GB compile upload the tunnel rejects, HTTP 413)
        wc = jax.lax.iota(jnp.uint32, CAP)
        return jnp.sum(u.astype(jnp.uint32) * wc) + jnp.sum(
            c.astype(jnp.uint32) * wc
        )

    ws = jax.device_put(words)
    vs = jax.device_put(vwords)
    log(f"devices: {jax.devices()}")
    # the salt BASE must differ per invocation, not just per iteration:
    # the remote runtime caches executions by (program, input values), and
    # a fixed salt sequence replays earlier runs' results at ~0.2 ms
    # (measured: 205,757 "Mbp/s" on a rerun — pure cache, no compute)
    import os as _os

    base = int.from_bytes(_os.urandom(3), "little")
    t0 = time.time()
    first = int(step(ws, vs, jnp.int32(base)))
    log(f"compile+first run: {time.time() - t0:.1f}s")
    for i in range(WARMUP - 1):
        int(step(ws, vs, jnp.int32(base + 1 + i)))
    # block_until_ready does NOT block through the remote tunnel (measured
    # 0.4 ms "iterations"); honest timing requires forcing the scalar to
    # host EVERY iteration, and chaining the next salt on the previous
    # checksum serializes the executions data-dependently
    t0 = time.time()
    out = first
    for i in range(ITERS):
        out = int(step(ws, vs, jnp.int32((out + i) & 0x7FFFFFFF)))
    dt = (time.time() - t0) / ITERS
    mbp = N_TILES * TILE_BASES / 1e6
    log(f"TPU: {mbp / dt:.1f} Mbp/s ({dt * 1e3:.1f} ms per {mbp:.0f} Mbp batch), checksum={out}")
    return mbp / dt


CPU_REPS = 4  # pinned: max-of-4 (r3 vs r4 showed a 4x swing on best-of-2)


def bench_cpu_numpy(words, vwords):
    """Same algorithm in numpy, single tile, single thread.

    The baseline is PINNED at max-of-CPU_REPS: host load varies between
    rounds (r3 measured 0.8 Mbp/s, r4 3.4 on the same code), and the
    baseline's variance propagates 1:1 into the headline vs_baseline
    ratio. The max over a fixed rep count estimates the machine's
    unloaded single-thread rate, which is the stable quantity."""
    w = words[0]
    v = vwords[0]
    best = None
    for _rep in range(CPU_REPS):
        best = _cpu_once(w, v, best)
    return best


def _cpu_once(w, v, best):
    from subphaser_tpu.io.encoding import unpack_words

    t0 = time.time()
    codes, valid = unpack_words(w, v)
    n_pos = TILE_BASES
    code = np.zeros(n_pos, dtype=np.int32)
    ok = np.ones(n_pos, dtype=bool)
    for j in range(K):
        code = (code << 2) | codes[j : j + n_pos].astype(np.int32)
        ok &= valid[j : j + n_pos].astype(bool)
    code &= (1 << (2 * K)) - 1
    from subphaser_tpu.io.encoding import revcomp_code

    rc = revcomp_code(code & 0x3FFFFFFF, K).astype(np.int32)
    canon = np.minimum(code, rc)
    canon = canon[ok]
    canon.sort(kind="stable")
    boundaries = np.empty(canon.size, dtype=bool)
    boundaries[0] = True
    np.not_equal(canon[1:], canon[:-1], out=boundaries[1:])
    idx = np.flatnonzero(boundaries)
    counts = np.diff(np.append(idx, canon.size))
    dt = time.time() - t0
    mbp = TILE_BASES / 1e6
    rate = mbp / dt
    log(f"CPU numpy baseline: {rate:.1f} Mbp/s ({dt:.2f}s per tile), "
        f"{idx.size} distinct, checksum={int(counts.sum())}")
    return rate if best is None else max(best, rate)


def _wait_for_backend(max_wait: float = 1200.0, interval: float = 60.0) -> bool:
    """Probe the axon backend in a SUBPROCESS and retry across relay flaps.

    A dead relay either raises RuntimeError at backend init (fast) or wedges
    the client in an uninterruptible futex — so the probe runs out-of-process
    where a SIGKILL on timeout cannot take the bench down with it. Re-probes
    every `interval` seconds for up to `max_wait` before giving up, so a
    transient relay restart does not turn into an rc!=0 round."""
    import subprocess

    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=180,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"backend probe succeeded on attempt {attempt}")
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        log(f"backend probe {attempt} failed; retrying in {interval:.0f}s "
            f"({deadline - time.time():.0f}s left)")
        time.sleep(interval)


def main():
    if not _wait_for_backend():
        log("axon backend unreachable after 20 min of probing; aborting")
        sys.exit(3)
    watchdog = _start_watchdog()
    rng = np.random.default_rng(0)
    words, vwords = make_tiles(rng)
    cpu = bench_cpu_numpy(words, vwords)
    tpu = bench_tpu(words, vwords)
    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "kmer_count_throughput",
                "value": round(tpu, 1),
                "unit": "Mbp/s",
                "vs_baseline": round(tpu / cpu, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
