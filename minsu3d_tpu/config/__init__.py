"""Hydra-compatible config system (no external deps).

The reference drives everything through a Hydra YAML tree (reference:
config/config.yaml:8-11, train.py:17). Hydra is not available in this
environment, so this module implements the subset of Hydra semantics the
framework needs, with identical user-facing behavior:

  * a root config with a ``defaults`` list composing ``data`` and ``model``
    groups (``data: base``, ``model: base``),
  * group YAMLs that themselves inherit via ``defaults: [base]``,
  * ``${a.b.c}`` interpolation (including chained references),
  * dotted CLI overrides (``model.trainer.devices=2``) and group selection
    (``model=pointgroup data=scannetv2``).

Configs are exposed as attribute-style dicts so model code reads exactly like
the reference (``cfg.model.network.m``).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any

import yaml

CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class ConfigDict(dict):
    """dict with attribute access; nested dicts are ConfigDicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _to_config_dict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_config_dict(v) for v in obj]
    return obj


def _load_yaml(path: str) -> ConfigDict:
    with open(path) as f:
        return _to_config_dict(yaml.safe_load(f) or {})


def _deep_merge(base: ConfigDict, override: ConfigDict) -> ConfigDict:
    """Merge override into base (override wins), recursing into dicts."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_group(group: str, name: str) -> ConfigDict:
    """Load a group config (e.g. model/pointgroup), following its defaults."""
    path = os.path.join(CONFIG_DIR, group, f"{name}.yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No config '{name}' in group '{group}' ({path})")
    cfg = _load_yaml(path)
    defaults = cfg.pop("defaults", [])
    merged = ConfigDict()
    for d in defaults:
        if d == "_self_":
            continue
        merged = _deep_merge(merged, _load_group(group, d))
    return _deep_merge(merged, cfg)


def _resolve_path(root: ConfigDict, dotted: str) -> Any:
    cur: Any = root
    for part in dotted.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


def _interpolate(root: ConfigDict) -> None:
    """Resolve ${...} references in-place, iterating until fixpoint."""

    def resolve_value(v: Any) -> Any:
        # Hydra resolves lazily; unresolvable references stay as-is here and
        # only fail if something downstream actually uses them.
        if not isinstance(v, str):
            return v
        try:
            full = _INTERP_RE.fullmatch(v)
            if full:  # whole-string reference keeps the referenced type
                return _resolve_path(root, full.group(1))
            return _INTERP_RE.sub(lambda m: str(_resolve_path(root, m.group(1))), v)
        except (KeyError, IndexError, TypeError):
            return v

    def walk(node: Any) -> bool:
        changed = False
        items = node.items() if isinstance(node, dict) else enumerate(node)
        for k, v in items:
            if isinstance(v, (dict, list)):
                changed |= walk(v)
            elif isinstance(v, str) and _INTERP_RE.search(v):
                new = resolve_value(v)
                if new is not v and new != v:
                    node[k] = new
                    changed = True
        return changed

    for _ in range(10):
        if not walk(root):
            return


def _parse_scalar(s: str) -> Any:
    return yaml.safe_load(s)


def _apply_override(cfg: ConfigDict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    cur = cfg
    for p in parts[:-1]:
        if p not in cur or not isinstance(cur[p], dict):
            cur[p] = ConfigDict()
        cur = cur[p]
    cur[parts[-1]] = _to_config_dict(value)


def load_config(overrides: list[str] | None = None) -> ConfigDict:
    """Compose the full config like ``@hydra.main`` does in the reference.

    ``overrides`` uses Hydra CLI syntax: ``model=pointgroup``,
    ``data=scannetv2``, ``model.trainer.max_epochs=2``.
    """
    overrides = list(overrides or [])
    root = _load_yaml(os.path.join(CONFIG_DIR, "config.yaml"))
    root.pop("defaults", None)

    group_choices = {"data": "base", "model": "base"}
    dotted: list[tuple[str, Any]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Bad override (expected key=value): {ov}")
        key, _, raw = ov.partition("=")
        if key in group_choices:
            group_choices[key] = raw
        else:
            dotted.append((key, _parse_scalar(raw)))

    cfg = ConfigDict()
    cfg["data"] = _load_group("data", group_choices["data"])
    cfg["model"] = _load_group("model", group_choices["model"])
    cfg = _deep_merge(cfg, root)

    for key, value in dotted:
        _apply_override(cfg, key, value)

    if "project_root_path" not in cfg or cfg.get("project_root_path") in (None, "${hydra:runtime.cwd}"):
        cfg["project_root_path"] = os.getcwd()
    _interpolate(cfg)
    return cfg
