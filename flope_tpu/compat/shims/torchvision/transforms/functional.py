"""torchvision.transforms.functional shim: attributes resolve lazily and
raise on call (only change_contrast uses TF.*, never on the A/B path)."""


def __getattr__(name):
    def _unavailable(*_a, **_k):
        raise NotImplementedError(
            f"torchvision shim: transforms.functional.{name} not available")
    return _unavailable
