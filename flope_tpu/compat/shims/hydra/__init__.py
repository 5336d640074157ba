"""Shim for `hydra` (not installed). The reference imports it at module scope
in pose_predictor.py / test_posenet.py; only the decorator surface is needed
when the modules are imported for the A/B (never the CLI entry)."""


def main(*_args, **_kwargs):
    def deco(fn):
        return fn
    return deco
