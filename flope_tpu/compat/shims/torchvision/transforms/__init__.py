"""torchvision.transforms shim (module-scope import surface only)."""


class ColorJitter:
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision shim: transforms not available")
