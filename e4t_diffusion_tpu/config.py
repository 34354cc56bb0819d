"""Config system: permissive attribute dicts + config.json round-trip.

Mirrors the reference contract:
- configs are persisted verbatim as ``config.json`` in each artifact dir
  (/root/reference/pretrain_e4t.py:522-523),
- tuning nests the pretraining config under ``pretrained_args``
  (/root/reference/tuning_e4t.py:227-228),
- reads go through a permissive wrapper where missing keys resolve to
  ``None`` (/root/reference/e4t/utils.py:17-40), and inference prefers the
  nested dict (/root/reference/inference.py:51-62).
"""
from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional


class AttributeDict:
    """Attribute access over a plain dict; missing attributes return None.

    Same permissive semantics as the reference's AttributeDict
    (/root/reference/e4t/utils.py:17-40).
    """

    def __init__(self, obj: Optional[Mapping[str, Any]] = None):
        object.__setattr__(self, "obj", dict(obj or {}))

    def __getattr__(self, name: str) -> Any:
        obj = object.__getattribute__(self, "obj")
        if name in obj:
            return obj[name]
        return None

    def __setattr__(self, name: str, value: Any) -> None:
        if name == "obj":
            object.__setattr__(self, name, value)
        else:
            self.obj[name] = value

    def __getitem__(self, key: str) -> Any:
        return self.obj[key]

    def __contains__(self, key: str) -> bool:
        return key in self.obj

    def get(self, key: str, default: Any = None) -> Any:
        return self.obj.get(key, default)

    def fields(self) -> dict:
        return self.obj

    def keys(self):
        return self.obj.keys()

    def items(self):
        return self.obj.items()

    def to_dict(self) -> dict:
        return dict(self.obj)

    def __repr__(self) -> str:
        return f"AttributeDict({self.obj!r})"


def save_config(config: Mapping[str, Any] | AttributeDict, save_dir: str) -> str:
    """Write ``config.json`` into ``save_dir`` (created if needed)."""
    if isinstance(config, AttributeDict):
        config = config.to_dict()
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "config.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(config, f, indent=2, default=str)
    return path


def load_config(path_or_dir: str) -> AttributeDict:
    """Load a config.json from a file path or an artifact directory.

    Mirrors load_config_from_pretrained (/root/reference/e4t/utils.py:76-89)
    minus the HF-Hub download path (no network egress on the TPU pods; use
    local artifact directories or the published-checkpoint converter).
    """
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No config.json at {path_or_dir}")
    with open(path, "r", encoding="utf-8") as f:
        return AttributeDict(json.load(f))


def get_e4t_config(config: AttributeDict) -> AttributeDict:
    """Resolve the E4T hyperparameter namespace.

    Tuned artifacts carry a two-level config: the tuning args at top level
    and the pretraining args nested under ``pretrained_args``. E4T keys
    (placeholder_token, domain_class_token, ...) live in the nested dict
    when present (/root/reference/inference.py:61-62).
    """
    if config.pretrained_args is not None:
        return AttributeDict(config.pretrained_args)
    return config


def getattr_from_config(config: AttributeDict, key: str) -> Any:
    """Prefer the nested pretrained_args value; assert present otherwise.

    Mirrors /root/reference/inference.py:51-58.
    """
    if config.pretrained_args is not None:
        return config.pretrained_args[key]
    value = getattr(config, key)
    assert value is not None, f"config key {key!r} is missing"
    return value
