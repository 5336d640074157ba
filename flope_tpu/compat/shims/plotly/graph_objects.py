"""plotly.graph_objects shim: any attribute resolves to a stub that raises
on instantiation (PEP 562 module __getattr__)."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise NotImplementedError("plotly shim: plotting not available")


def __getattr__(name):
    return _Unavailable
