"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic (pjit/shard_map over a Mesh) is validated on virtual
CPU devices; real-TPU runs happen only in bench.py / driver dry-runs.

Note: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS pointing at the TPU tunnel, so env vars set here are too late —
we must use jax.config.update before any backend is initialized.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is dominated by XLA compiles of the
# YOLO/ResNet graphs (~40 s each on CPU); cache them across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
