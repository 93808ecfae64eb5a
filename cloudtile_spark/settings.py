"""Tiling settings — driver-side validated config with the reference's
observable semantics (reference src/cloudtile/tippecanoe.py:14-116, validated
behaviors pinned by reference tests/test_tippecanoe.py):

- defaults loaded from a packaged YAML (uncommented keys);
- the FULL option universe (commented keys included) defines validity:
  unknown key -> KeyError (reference tippecanoe.py:41-42);
- key normalization ``_`` -> ``-`` (tippecanoe.py:39);
- zoom ordering enforced on set, with ``maximum-zoom == "g"`` ("guess")
  escaping the check (tippecanoe.py:44-57);
- empty config file -> ValueError (tippecanoe.py:113-114);
- override precedence: yaml defaults < config file < explicit kwargs
  (tippecanoe.py:27-33, geofile.py:202-216).

Unlike the reference these settings never become CLI argv — they parameterize
the Spark pyramid plan directly (operators/pyramid.py).
"""

from __future__ import annotations

from collections import UserDict
from importlib.resources import files
from pathlib import Path
from typing import Any, Optional

import yaml


class TilingSettings(UserDict):
    """Validated dict of tiling options (tippecanoe-compatible keys)."""

    def __init__(self, cfg_path: Optional[str] = None, **kwargs: Any) -> None:
        self._all_settings = self._read_yaml_config(read_all=True)
        super().__init__()
        for k, v in self._read_yaml_config(cfg_path=cfg_path).items():
            self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __repr__(self) -> str:
        data = {k: v for k, v in self.items() if v is not False}
        return f"TilingSettings({data})"

    def __setitem__(self, key: str, value: Any) -> None:
        key = key.replace("_", "-")
        if key not in self._all_settings:
            raise KeyError(f"Setting {key} is not a valid tiling setting.")
        if key == "maximum-zoom" and value != "g":
            if "minimum-zoom" in self and value < self["minimum-zoom"]:
                raise ValueError("Maximum zoom cannot be less than minimum zoom.")
        if key == "minimum-zoom":
            if "maximum-zoom" in self and self["maximum-zoom"] != "g":
                if value > self["maximum-zoom"]:
                    raise ValueError(
                        "Minimum zoom cannot be greater than maximum zoom."
                    )
        super().__setitem__(key, value)

    def override_settings(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            self[k] = v

    @staticmethod
    def _parse_settings_dict(settings: dict[str, Any]) -> dict[str, Any]:
        flat: dict[str, Any] = {}
        for v in settings.values():
            if isinstance(v, dict):
                flat.update(v)
        return flat

    @staticmethod
    def _read_yaml_config(
        cfg_path: Optional[str] = None, read_all: bool = False
    ) -> dict[str, Any]:
        if cfg_path is None:
            data = (files("cloudtile_spark") / "tiling.yaml").read_text()
            path: Any = "<packaged tiling.yaml>"
        else:
            path = Path(cfg_path).resolve()
            if not path.exists():
                raise FileNotFoundError(f"Config file {path} not found")
            data = path.read_text(encoding="utf-8")
        if read_all:
            data = data.replace("  # ", "  ")
        config_dict = yaml.safe_load(data)
        if config_dict is None:
            raise ValueError(f"{path} seems to be empty")
        return TilingSettings._parse_settings_dict(config_dict)
