"""Config system: python-module / json / yaml files -> attribute dict.

Parity with the reference config loader (reference: det3d/torchie/utils/config.py:78-100):
``.py`` configs are imported as modules and their module-level globals
harvested; ``.json``/``.yaml`` are parsed directly. Values are wrapped in
``ConfigDict`` for attribute access (the reference uses addict; we vendor a
small equivalent so the framework has zero non-baked dependencies).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile
from pathlib import Path
from typing import Any


class ConfigDict(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(f"'ConfigDict' object has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in value.items()})
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._wrap(v) for v in value)
        return value

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in (*args, kwargs):
            for k, v in dict(src).items():
                self[k] = ConfigDict._wrap(v)


class Config:
    """Wrapper holding a ConfigDict plus provenance (filename, text)."""

    def __init__(self, cfg_dict: dict | None = None, cfg_text: str = "", filename: str = ""):
        self._cfg_dict = ConfigDict(cfg_dict or {})
        self._text = cfg_text
        self._filename = filename

    @staticmethod
    def fromfile(filename: str | os.PathLike) -> "Config":
        path = Path(filename).expanduser().resolve()
        if not path.exists():
            raise FileNotFoundError(str(path))
        suffix = path.suffix
        if suffix == ".py":
            cfg_dict = _exec_py_config(path)
        elif suffix == ".json":
            cfg_dict = json.loads(path.read_text())
        elif suffix in (".yml", ".yaml"):
            import yaml  # baked into the image via other deps

            cfg_dict = yaml.safe_load(path.read_text())
        else:
            raise IOError(f"Only .py/.json/.yaml configs supported, got {suffix}")
        return Config(cfg_dict, cfg_text=path.read_text(), filename=str(path))

    @property
    def filename(self) -> str:
        return self._filename

    @property
    def text(self) -> str:
        return self._text

    def __getattr__(self, name: str) -> Any:
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name: str) -> Any:
        return self._cfg_dict[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = ConfigDict._wrap(value)

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self._cfg_dict[name] = ConfigDict._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._cfg_dict

    def get(self, name: str, default: Any = None) -> Any:
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def to_dict(self) -> dict:
        return _unwrap(self._cfg_dict)


def _unwrap(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return type(value)(_unwrap(v) for v in value)
    return value


def _exec_py_config(path: Path) -> dict:
    """Import the .py config as a throwaway module and harvest its globals."""
    with tempfile.TemporaryDirectory() as tmp:
        mod_name = f"_det3d_tpu_cfg_{abs(hash(str(path)))}"
        spec = importlib.util.spec_from_file_location(mod_name, str(path))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        try:
            spec.loader.exec_module(mod)
            return {
                k: v
                for k, v in vars(mod).items()
                if not k.startswith("__") and not callable(v) and not _is_module(v)
            }
        finally:
            sys.modules.pop(mod_name, None)


def _is_module(v: Any) -> bool:
    import types

    return isinstance(v, types.ModuleType)
