"""Lightweight hierarchical config: YAML + dotted CLI overrides.

The reference drives everything through Hydra/OmegaConf
(``/root/reference/examples/simple_scene.py:11``,
``/root/reference/diffdope/diffdope.py:1300-1309``).  Neither is available in
this image, and neither is needed: this module provides an attribute-accessible
nested config loaded from YAML with ``key.sub=value`` override strings, which
covers the full surface the reference uses (group fan-out into classes, CLI
overrides, programmatic mutation).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterable, Mapping, Optional, Sequence, Union

import yaml

__all__ = ["ConfigNode", "load_config", "default_config_path"]


def default_config_path() -> Path:
    """Path of the packaged default config (mirrors configs/diffdope.yaml)."""
    return Path(__file__).resolve().parent.parent / "configs" / "diffdope.yaml"


class ConfigNode(dict):
    """A dict with attribute access, recursive wrapping, and deep merge.

    Behaves like the subset of ``omegaconf.DictConfig`` the reference relies
    on: ``cfg.camera.fx``, ``cfg.losses.l1_mask``, ``**cfg.camera`` unpacking.
    """

    def __init__(self, data: Optional[Mapping[str, Any]] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    # -- wrapping ---------------------------------------------------------
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, ConfigNode):
            return value
        if isinstance(value, Mapping):
            return ConfigNode(value)
        if isinstance(value, (list, tuple)):
            return [ConfigNode._wrap(v) for v in value]
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, self._wrap(value))

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # -- utilities --------------------------------------------------------
    def merge(self, other: Mapping[str, Any]) -> "ConfigNode":
        """Recursively merge ``other`` into self (other wins)."""
        for k, v in other.items():
            if k in self and isinstance(self[k], ConfigNode) and isinstance(v, Mapping):
                self[k].merge(v)
            else:
                self[k] = v
        return self

    def set_dotted(self, dotted_key: str, value: Any) -> None:
        """Set ``a.b.c`` style key to a value (creating intermediate nodes)."""
        parts = dotted_key.split(".")
        node: ConfigNode = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], ConfigNode):
                node[p] = ConfigNode()
            node = node[p]
        node[parts[-1]] = value

    def get_dotted(self, dotted_key: str, default: Any = None) -> Any:
        node: Any = self
        for p in dotted_key.split("."):
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node

    def to_dict(self) -> dict:
        out: dict = {}
        for k, v in self.items():
            if isinstance(v, ConfigNode):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, ConfigNode) else x for x in v]
            else:
                out[k] = v
        return out

    def copy(self) -> "ConfigNode":  # type: ignore[override]
        return ConfigNode(copy.deepcopy(self.to_dict()))

    def yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _parse_override_value(raw: str) -> Any:
    """Parse an override value string with YAML semantics (hydra-like)."""
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def load_config(
    path: Optional[Union[str, Path]] = None,
    overrides: Optional[Iterable[str]] = None,
) -> ConfigNode:
    """Load a YAML config and apply ``key.sub=value`` override strings.

    Args:
        path: YAML file; defaults to the packaged ``configs/diffdope.yaml``.
        overrides: iterable of ``dotted.key=value`` strings (e.g. from argv).
    """
    if path is None:
        path = default_config_path()
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    cfg = ConfigNode(data)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} is not of the form key=value")
        key, _, raw = ov.partition("=")
        cfg.set_dotted(key.strip(), _parse_override_value(raw.strip()))
    return cfg


def cli_overrides(argv: Sequence[str]) -> list:
    """Extract hydra-style overrides from an argv list (all args with '=')."""
    return [a for a in argv if "=" in a and not a.startswith("-")]
