"""Worker for the dead-rank watchdog test (rank-failure policy).

Both ranks initialize jax.distributed; rank 1 then exits WITHOUT joining
the exchange, leaving rank 0 blocked in the allgather. The collective
watchdog (SUBPHASER_COLLECTIVE_TIMEOUT) must take rank 0 down with exit
code 17 instead of letting it wedge forever — the documented recovery is
"restart the job; checkpoints resume" (parallel/distributed.py module
docstring; reference-grid analogue RunCmdsMP.py:173-217).

Usage: dist_worker_dead.py <coordinator> <rank> <nproc>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, rank, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from subphaser_tpu.parallel.distributed import exchange_blobs, init_distributed

    init_distributed(coordinator, nproc, rank)
    if rank == 1:
        # die before contributing to the exchange (simulates a crashed peer)
        os._exit(0)
    exchange_blobs({rank: b"payload"}, 2)
    print("exchange completed (unexpected)")


if __name__ == "__main__":
    main()
