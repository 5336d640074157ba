"""Shim for `omegaconf` (not installed): import-time placeholder."""


class DictConfig(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class OmegaConf:
    @staticmethod
    def to_yaml(cfg):
        return str(cfg)

    @staticmethod
    def create(obj=None):
        return DictConfig(obj or {})
