"""YAML config loading with ``${var}`` interpolation.

Keeps the reference's YAML surface and key names (config.yaml etc.) without
depending on OmegaConf: top-level keys can reference one another with
``${key}``, resolved recursively like OmegaConf interpolation
(reference: config.yaml:10, config_infer_folder.yaml:2-8).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _resolve(value: Any, root: Dict[str, Any], depth: int = 0) -> Any:
    if depth > 16:
        raise ValueError("Config interpolation too deep (cycle?)")
    if isinstance(value, str):
        def sub(m):
            key = m.group(1)
            cur: Any = root
            for part in key.split("."):
                if not isinstance(cur, dict) or part not in cur:
                    raise KeyError(f"Interpolation key '{key}' not found")
                cur = cur[part]
            return str(_resolve(cur, root, depth + 1))

        return _INTERP.sub(sub, value)
    if isinstance(value, dict):
        return {k: _resolve(v, root, depth + 1) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve(v, root, depth + 1) for v in value]
    return value


def load_config(path: str, overrides: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Load YAML, apply overrides, resolve ${...} interpolation."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    return _resolve(cfg, cfg)


def parse_cli_overrides(args) -> Dict[str, Any]:
    """key=value CLI overrides with YAML-typed values."""
    out: Dict[str, Any] = {}
    for a in args:
        if "=" not in a:
            raise ValueError(f"Override '{a}' must be key=value")
        k, v = a.split("=", 1)
        parsed = yaml.safe_load(v)
        if isinstance(parsed, str):
            # YAML 1.1 needs '5.0e-4' for floats; accept bare '5e-4' too.
            try:
                parsed = int(parsed)
            except ValueError:
                try:
                    parsed = float(parsed)
                except ValueError:
                    pass
        out[k] = parsed
    return out
