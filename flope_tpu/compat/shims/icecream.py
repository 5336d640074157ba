"""Shim for `icecream` (not installed): ic() as a silent pass-through."""


class _IceCream:
    def __call__(self, *args):
        if not args:
            return None
        return args[0] if len(args) == 1 else args

    def configureOutput(self, *a, **k):
        pass

    def disable(self):
        pass

    def enable(self):
        pass


ic = _IceCream()
