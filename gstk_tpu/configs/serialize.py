"""Config YAML save/load.

The reference saves its TrainerConfig as YAML next to the outputs and reloads
it verbatim for eval/render/export (``configs/experiment_config.py:139-145``,
``utils/eval_utils.py:80-82``). Same pattern here: nested dataclasses are
serialized with a ``__class__`` tag so subclasses (DepthConfig/SurfaceConfig)
round-trip.
"""

from __future__ import annotations

import dataclasses
import importlib
from pathlib import Path
from typing import Any

import yaml


def to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {
            "__class__": f"{type(obj).__module__}.{type(obj).__qualname__}"
        }
        for f in dataclasses.fields(obj):
            out[f.name] = to_dict(getattr(obj, f.name))
        return out
    if isinstance(obj, Path):
        return {"__path__": str(obj)}
    if isinstance(obj, (list, tuple)):
        return [to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    return obj


def from_dict(data: Any) -> Any:
    if isinstance(data, dict):
        if "__path__" in data:
            return Path(data["__path__"])
        if "__class__" in data:
            mod, _, name = data["__class__"].rpartition(".")
            cls = getattr(importlib.import_module(mod), name)
            kwargs = {
                k: from_dict(v) for k, v in data.items() if k != "__class__"
            }
            field_names = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in kwargs.items() if k in field_names})
        return {k: from_dict(v) for k, v in data.items()}
    if isinstance(data, list):
        return [from_dict(x) for x in data]
    return data


def save_config(path, config) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(config), f, sort_keys=False)


def load_config(path):
    with open(path) as f:
        return from_dict(yaml.safe_load(f))
