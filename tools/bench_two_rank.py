"""Measure the 2-rank jax.distributed wall-clock win (VERDICT r4 weak #7).

Round 3 sharded mapping/LTR/classification/blocks across ranks and round 4
proved 2-process byte-identity (tests/test_distributed.py), but the
wall-clock WIN was never recorded. This runs the SAME mapping/LTR-heavy
synthetic input through the production ``Pipeline.run`` once as a single
process and once as two ``jax.distributed`` ranks — both via
tests/dist_worker_pipeline.py so the code path (init_distributed included)
is identical — and prints one JSON line with both walls.

The reference's analogue is its multiprocessing/DRMAA grid farming the
same per-chromosome jobs (reference RunCmdsMP.py:38-152); its speedup is
likewise bounded by job granularity and shared-resource contention.

Caveat printed with the result: on this 4-core container both ranks share
the host CPUs, so device-bound XLA work parallelizes but host pools
contend; on real multi-host TPU pods each rank owns its chips.

Usage: python tools/bench_two_rank.py [chrom_kb] [n_sets] [--cores N]

--cores N pins each rank to its OWN N host cores with taskset (rank r ->
cores rN..rN+N-1) and the 1-rank baseline to the SAME N cores — modeling
"adding a second host" (the multi-host story) instead of oversubscribing
one box: an unpinned 2-rank run on a shared 4-core container measures
mostly compile duplication + core contention and comes out ~0.8x.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker_pipeline.py")
sys.path.insert(0, REPO)

CHROM_KB = int(sys.argv[1]) if len(sys.argv) > 1 else 400
N_SETS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = (int(sys.argv[sys.argv.index("--cores") + 1])
         if "--cores" in sys.argv else 0)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(nproc: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nproc}"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, "/root/.axon_site", env.get("PYTHONPATH")) if p
    )
    return env


# phase boundaries, in pipeline order (names mirror the run report); each
# phase's duration = next marker's log timestamp - its own
PHASES = [
    ("count", r"###Step: Kmer Count"),
    ("filter", r"Filtering differential kmers"),
    ("cluster", r"###Step: Cluster"),
    ("mapping", r"Mapping \d+ subgenome-specific"),
    ("enrich", r"Enriching subgenome"),
    ("ltr", r"###Step: LTR"),
    ("circos+blocks", r"###Step: Circos"),
    ("END", r"Pipeline completed"),
]


def parse_phases(log: str) -> dict:
    import datetime
    import re

    stamps = []
    for name, pat in PHASES:
        m = re.search(r"(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d).*" + pat, log)
        stamps.append(
            (name, datetime.datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S"))
            if m else (name, None)
        )
    out = {}
    for (name, t0), (_, t1) in zip(stamps, stamps[1:]):
        if t0 is not None and t1 is not None:
            out[name] = (t1 - t0).total_seconds()
    return out


def run(nproc: int, shared: str) -> tuple[float, dict]:
    port = _free_port()
    t0 = time.time()
    def argv(r: int) -> list:
        cmd = [sys.executable, WORKER, f"127.0.0.1:{port}", str(r),
               str(nproc), shared]
        if CORES:
            lo = r * CORES
            cmd = ["taskset", "-c", f"{lo}-{lo + CORES - 1}"] + cmd
        return cmd

    procs = [
        subprocess.Popen(
            argv(r), env=_env(nproc), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for r in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        outs.append(out.decode(errors="replace"))
        assert p.returncode == 0, outs[-1][-4000:]
    return time.time() - t0, parse_phases(outs[0])


def main():
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from make_synthetic import make_genome

    base = tempfile.mkdtemp(prefix="two_rank_")
    try:
        walls, phases = {}, {}
        for nproc in (1, 2):
            shared = os.path.join(base, f"n{nproc}")
            os.makedirs(shared)
            make_genome(shared, n_sets=N_SETS, chrom_size=CHROM_KB * 1000,
                        with_ltr_domains=True)
            walls[nproc], phases[nproc] = run(nproc, shared)
            print(f"nproc={nproc}: {walls[nproc]:.1f}s {phases[nproc]}",
                  flush=True)
        print(json.dumps({
            "genome_kb": CHROM_KB * N_SETS * 3,
            "single_s": round(walls[1], 1),
            "two_rank_s": round(walls[2], 1),
            "speedup": round(walls[1] / walls[2], 2),
            "phase_speedup": {
                k: round(phases[1][k] / max(phases[2][k], 1e-9), 2)
                for k in phases[1] if k in phases[2] and phases[1][k] >= 2
            },
            "phases_single_s": phases[1],
            "phases_two_rank_s": phases[2],
            "note": "4-core container; ranks share host CPUs",
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
