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

# Two-tier suite (single-core host; the full run exceeds 9 minutes):
#   core tier: pytest -m "not slow"   (< 2 min target)
#   full:      pytest
# Modules dominated by big XLA graph compiles (YOLO/pipeline), subprocess
# CLI chains, or training loops are marked slow wholesale.
_SLOW_MODULES = {
    "test_cli",                   # subprocess CLI chain
    "test_fusion_ab",             # subprocess reference runner
    "test_reference_ab",          # runs the reference's actual code
    "test_yolo",                  # YOLO11-seg forward compiles
    "test_yolo_train",            # YOLO train-step compiles
    "test_train",                 # PoseNet training loops
    "test_hard_domain",           # scene renders + model forwards
    "test_detector_integration",  # YOLO + pipeline end-to-end
    "test_pipeline",              # fused-graph compiles
    "test_pipeline2",             # 2-stage pipeline-parallel compiles
    "test_crop_pallas",           # Pallas kernels under CPU interpreter
    "test_scene_dataset",         # synthetic scene renders
    "test_aruco",                 # synthetic ArUco renders + cv2 detect
    "test_streaming",             # double-buffered feeder timing
    "test_teacher_tiny",          # real HF GDINO/SAM forwards (tiny configs)
    "test_teacher_detector",      # torch/transformers import dominates
    "test_eval",                  # full metrics-harness frames
    "test_posenet",               # ResNet-18 forward/backward compiles
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
