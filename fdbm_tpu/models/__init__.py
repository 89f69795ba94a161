"""Backbone registry and model families.

Names mirror the reference BackboneRegistry (fdbm/backbones/shared.py:10)
so the YAML config surface is identical.
"""

from fdbm_tpu.utils.registry import Registry

BackboneRegistry: Registry = Registry("Backbone")

# Populate the registry.
from fdbm_tpu.models import tfgridnet as _tfgridnet  # noqa: E402,F401
from fdbm_tpu.models import ncsnpp as _ncsnpp  # noqa: E402,F401

__all__ = ["BackboneRegistry"]
