"""JAX runtime setup shared by the CLI scripts.

First compiles through a remote-attached TPU take minutes; the persistent
compilation cache makes repeat invocations start in seconds. Every CLI that
touches a model calls setup_jax() before using the backend.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["setup_jax", "default_cache_dir"]


def default_cache_dir() -> Path:
    env = os.environ.get("FLOPE_TPU_CACHE")
    if env:
        return Path(env)
    # Editable install: the package sits inside the repo; keep one cache at
    # the repo root (shared with bench.py).
    return Path(__file__).resolve().parents[2] / ".jax_cache_tpu"


def setup_jax(cpu: bool = False, cache_dir=None) -> None:
    """Configure platform + persistent compile cache (idempotent).

    Must run before any jax backend use; env vars are too late in this
    environment (jax is pre-imported at interpreter startup), so this uses
    jax.config.update like tests/conftest.py.
    """
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = Path(cache_dir) if cache_dir else default_cache_dir()
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
