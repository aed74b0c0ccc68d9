"""Persistent XLA compilation cache setup.

Remote compilation through the axon tunnel costs ~15 s for small programs
and minutes for large sort programs, and jit caches don't survive the
process. jax's persistent compilation cache does (verified: 15 s -> 0.5 s
across processes), so every entry point enables it."""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "SUBPHASER_JAX_CACHE", os.path.join("/tmp", "subphaser_jax_cache")
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # cache is an optimization; never fail the run for it
        pass
    return path
