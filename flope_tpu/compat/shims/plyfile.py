"""Shim for `plyfile` (not installed). Import-time placeholder only: the
reference imports it at module scope in utils/io.py but the A/B path never
reads a .ply file."""


class PlyData:
    @staticmethod
    def read(*_a, **_k):
        raise NotImplementedError("plyfile shim: .ply reading not available")


class PlyElement:
    pass
