"""On-demand build of the native host library (g++ -O3 -shared).

The toolchain is invoked once per source revision; the .so is cached under
$FLOPE_NATIVE_CACHE (default ~/.cache/flope_tpu) keyed by a source hash, so
editable installs rebuild automatically when the .cpp changes. Returns None
when no compiler is available — callers fall back to the numpy paths.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile
from pathlib import Path

__all__ = ["build_library"]

_SRC = Path(__file__).resolve().parent / "crop_render.cpp"


def _cache_dir() -> Path:
    env = os.environ.get("FLOPE_NATIVE_CACHE")
    return Path(env) if env else Path.home() / ".cache" / "flope_tpu"


def build_library() -> Path | None:
    """Compile (or reuse) the native library; None if unbuildable."""
    if not _SRC.exists():
        return None
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    out = _cache_dir() / f"crop_render_{digest}.so"
    if out.exists():
        return out
    gxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if gxx is None:
        return None
    out.parent.mkdir(parents=True, exist_ok=True)
    with tempfile.NamedTemporaryFile(suffix=".so", dir=out.parent,
                                     delete=False) as tmp:
        tmp_path = Path(tmp.name)
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", str(_SRC),
           "-o", str(tmp_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        tmp_path.unlink(missing_ok=True)
        return None
    tmp_path.replace(out)  # atomic within the cache dir
    return out
