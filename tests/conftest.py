"""Test configuration: force the CPU backend with 8 virtual devices so unit
and sharding tests run fast and deterministically without TPU hardware
(mirrors the driver's multichip dryrun environment).

The container's axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so both the env var and jax.config must be overridden here, before
any test imports jax-dependent modules.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
