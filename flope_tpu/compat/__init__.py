"""Compatibility layer for running the reference (sunflower) code in-place.

Used for reference-grounded fidelity A/B testing: the reference's actual
Python modules (at /root/reference) are imported unmodified, with tiny shim
packages standing in for dependencies absent from this environment
(roma, torchvision, beartype, icecream, plyfile, hydra, omegaconf, plotly).
The shims are appended to the END of sys.path so real installed packages
always win.
"""

from flope_tpu.compat.reference_runner import (
    add_reference_paths,
    make_reference_predictor,
    run_reference_frames,
)

__all__ = [
    "add_reference_paths",
    "make_reference_predictor",
    "run_reference_frames",
]
