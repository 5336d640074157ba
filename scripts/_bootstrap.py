"""Make ``flope_tpu`` importable when a script is run by path.

``python scripts/<tool>.py`` puts only ``scripts/`` on ``sys.path`` — not the
repo root — so the package is invisible unless it happens to be installed.
Every CLI does ``import _bootstrap`` first (resolvable because ``sys.path[0]``
is this directory), which prepends the repo root.
"""

import sys
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
