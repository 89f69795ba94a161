from fdbm_tpu.utils.registry import Registry

__all__ = ["Registry"]
