"""Worker for the 2-process jax.distributed FULL-PIPELINE test.

Each process initializes jax.distributed, then runs the production
``Pipeline.run`` on the same synthetic allotetraploid input with its own
outdir/tmpdir. Counting, mapping, LTR detection, classification (both
passes) and block pairs are all rank-sharded with payload exchanges
(parallel/distributed); the deterministic merge makes the per-rank output
trees byte-identical — the multi-host story the reference covers with
DRMAA array jobs + filesystem merge (RunCmdsMP.py:38-217).

Usage: dist_worker_pipeline.py <coordinator> <rank> <nproc> <sharedtmp>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, rank: int, nproc: int, shared: str):
    from subphaser_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator, nproc, rank)
    assert jax.process_count() == nproc

    # rank-deterministic shared input (written by the parent test)
    genome = os.path.join(shared, "genome.fa.gz")
    cfg = os.path.join(shared, "sg.config")

    from subphaser_tpu.phase.pipeline import Pipeline

    out = os.path.join(shared, f"out_r{rank}")
    tmp = os.path.join(shared, f"tmp_r{rank}")
    hmm = os.path.join(shared, "rexdb_mini.hmm")
    pipe = Pipeline(
        [genome], [cfg],
        outdir=out, tmpdir=tmp,
        min_freq=50, replicates=50, tile_bases=1 << 16, figfmt="png",
        window_size=50_000, min_block=10_000,
        hmm_db=hmm if os.path.exists(hmm) else None,
        # FULL default: mapping, LTR detection/classification, blocks and
        # circos all run SHARDED across the processes (VERDICT r3 #4)
    )
    pipe.run()
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
