"""One config system replacing the reference's four (SURVEY.md §5.6):
EasyConfig recursive YAML (+`_base_` inheritance like mmcv, with
`_delete_` semantics) + dot-access + CLI `key=value` overrides; subsumes
the argparse monoliths and fairseq dataclases.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access, recursive."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj: Any) -> Any:
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _merge(base: Dict, override: Dict) -> Dict:
    """Recursive merge; `_delete_: true` in override replaces the subtree
    wholesale (mmcv semantics)."""
    out = copy.deepcopy(base)
    for key, value in override.items():
        if key == "_delete_":
            continue
        if (
            isinstance(value, dict)
            and isinstance(out.get(key), dict)
            and not value.get("_delete_", False)
        ):
            out[key] = _merge(out[key], value)
        else:
            if isinstance(value, dict):
                value = {k: v for k, v in value.items() if k != "_delete_"}
            out[key] = copy.deepcopy(value)
    return out


def _parse_value(text: str) -> Any:
    return yaml.safe_load(text)


def load_config(
    path: str, overrides: Optional[List[str]] = None
) -> Config:
    """Load YAML with `_base_` inheritance chain + `a.b.c=value` overrides."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base in bases:
        base_path = os.path.join(os.path.dirname(path), base)
        merged = _merge(merged, load_config(base_path).to_dict())
    merged = _merge(merged, cfg)

    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        key, value = ov.split("=", 1)
        node = merged
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return Config.wrap(merged)
