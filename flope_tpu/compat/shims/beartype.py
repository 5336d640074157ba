"""Shim for `beartype` (not installed): pass-through decorator.

The reference uses it only as `@jaxtyped(typechecker=beartype)` on geometry
functions (mvg.py:11 etc.) — runtime type checking, no behavioral effect on
correct inputs.
"""


def beartype(fn=None, **_kwargs):
    if fn is None:
        return lambda f: f
    return fn


class BeartypeConf:  # pragma: no cover - API placeholder
    def __init__(self, *a, **k):
        pass
