"""Shim for `tyro` (not installed in this environment).

The reference uses only ``tyro.cli(fn)`` with keyword-default functions
(scripts/kalman_filter.py:147, train_yolo_seg.py:13, ...): build an argparse
CLI from the function signature (defaults + annotations) and call it.
"""

import argparse
import inspect


def cli(fn, args=None):
    sig = inspect.signature(fn)
    ap = argparse.ArgumentParser(description=fn.__doc__)
    for name, param in sig.parameters.items():
        if param.default is inspect.Parameter.empty:
            ap.add_argument(name)
        else:
            typ = (param.annotation if param.annotation is not inspect.Parameter.empty
                   else type(param.default))
            if typ is bool:
                ap.add_argument(f"--{name.replace('_', '-')}",
                                action="store_true", default=param.default)
            else:
                ap.add_argument(f"--{name.replace('_', '-')}",
                                type=typ if callable(typ) else str,
                                default=param.default)
    ns = ap.parse_args(args)
    return fn(**vars(ns))
