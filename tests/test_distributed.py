"""2-process jax.distributed CPU test: sliced counting + allgather merge.

Launches two real OS processes that initialize jax.distributed against a
local coordinator, split the genome's tiles between them
(host_tile_slice), and reconstruct the global k-mer spectrum with
allgather_spectrum. The merged result must equal a single-process count of
the full genome — the multi-host story the reference covers with DRMAA
array jobs + filesystem merge (RunCmdsMP.py:38-217, Jellyfish.py:446-458).
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_count(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    port = _free_port()
    out = tmp_path / "merged.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, "/root/.axon_site", env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(r), "2",
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    assert out.exists(), "rank 0 wrote no output"

    # single-process oracle over the same deterministic genome
    sys.path.insert(0, os.path.dirname(worker))
    try:
        import dist_worker
    finally:
        sys.path.pop(0)
    from subphaser_tpu.ops.count import (
        count_codes_threshold,
        extract_codes_batch,
    )

    genome = dist_worker.make_genome()
    parts = [
        extract_codes_batch(
            t.words, t.vwords, dist_worker.K, dist_worker.TILE_BASES // 16
        )
        for t in genome.tiles(dist_worker.K, tile_bases=dist_worker.TILE_BASES)
    ]
    codes, counts = count_codes_threshold(parts, dist_worker.LOWER)
    got = np.load(out)
    assert np.array_equal(got["codes"], codes)
    assert np.array_equal(got["counts"], counts)


def test_two_process_pipeline_run(tmp_path):
    """The PRODUCTION ``Pipeline.run`` across 2 jax.distributed processes:
    counting, mapping, LTR detection, classification (both passes) and
    block pairs are each rank-sharded with payload exchanges (the body
    asserts the per-stage work-division markers); every per-rank output
    file must be byte-identical to the other rank AND to a single-process
    run (reference multi-host parity, RunCmdsMP.py:38-217)."""
    worker = os.path.join(os.path.dirname(__file__), "dist_worker_pipeline.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    shared = tmp_path / "shared"
    shared.mkdir()

    # shared deterministic input
    sys.path.insert(0, os.path.dirname(worker))
    try:
        from make_synthetic import make_genome
    finally:
        sys.path.pop(0)
    make_genome(str(shared), n_sets=3, chrom_size=100_000,
                with_ltr_domains=True)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, "/root/.axon_site", env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(r), "2",
             str(shared)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"pipeline worker failed:\n{text[-4000:]}"
    # every sharded stage must actually have engaged and divided work
    for marker in ("Distributed counting", "Sharded mapping",
                   "Sharded LTR detection", "Sharded classification",
                   "Sharded blocks"):
        assert any(marker in t for t in outputs), (marker, outputs[0][-3000:])
    # work division: each rank owns a strict subset of the chromosomes
    assert any("rank 0 owns 3/6 chromosomes" in t for t in outputs)
    assert any("rank 1 owns 3/6 chromosomes" in t for t in outputs)

    # single-process run on the same input
    from subphaser_tpu.phase.pipeline import Pipeline

    Pipeline(
        [str(shared / "genome.fa.gz")], [str(shared / "sg.config")],
        outdir=str(shared / "out_single"), tmpdir=str(shared / "tmp_single"),
        min_freq=50, replicates=50, tile_bases=1 << 16, figfmt="png",
        window_size=50_000, min_block=10_000,
        hmm_db=str(shared / "rexdb_mini.hmm"),
    ).run()

    def data_files(d):
        return sorted(
            f for f in os.listdir(d)
            if not f.endswith((".png", ".pdf"))  # figures carry timestamps
        )

    r0, r1, s = (str(shared / x) for x in ("out_r0", "out_r1", "out_single"))
    names = data_files(r0)
    assert names == data_files(r1) == data_files(s), "output sets differ"
    assert names, "no output files produced"
    for f in names:
        b0 = open(os.path.join(r0, f), "rb").read()
        assert b0 == open(os.path.join(r1, f), "rb").read(), f"rank diff: {f}"
        assert b0 == open(os.path.join(s, f), "rb").read(), f"single diff: {f}"


def test_dead_rank_watchdog_exits_17(tmp_path):
    """Rank-failure policy: when a peer dies before an exchange, the
    survivor must NOT wedge in the allgather — the collective watchdog
    takes it down with exit code 17 within SUBPHASER_COLLECTIVE_TIMEOUT
    seconds, and the operator restarts the job (checkpoints resume). The
    reference grid's analogue is its retry-failed-jobs loop
    (RunCmdsMP.py:173-217)."""
    worker = os.path.join(os.path.dirname(__file__), "dist_worker_dead.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["SUBPHASER_COLLECTIVE_TIMEOUT"] = "10"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, "/root/.axon_site", env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(r), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "survivor wedged: watchdog did not fire within the timeout"
            )
        outputs.append(stdout.decode(errors="replace"))
    assert procs[1].returncode == 0, outputs[1][-2000:]
    assert procs[0].returncode == 17, (
        f"survivor rc={procs[0].returncode}, want 17 (watchdog exit):\n"
        f"{outputs[0][-2000:]}"
    )
    assert "did not complete within" in outputs[0]
