"""Unified config system.

Replaces the reference's three config stacks (SURVEY §5.6) with one:
  * pcdet YAML + `_BASE_CONFIG_` inheritance + `--set` dot-path overrides
    (VoxelRCNN/pcdet/config.py:30-85)
  * det3d executable python-module configs (torchie Config.fromfile)
  * mmcv python configs with `_base_` + `--cfg-options`

df3d configs are plain nested dicts loaded from YAML with `_base_`
inheritance (both spellings accepted) and dot-path overrides; presets in
df3d.config.presets materialize the typed model dataclasses.
"""

from __future__ import annotations

import copy
import pathlib
from typing import Any, Mapping

import yaml


class Config(dict):
    """Dict with attribute access (EasyDict-style, recursion on getattr)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v


def _deep_merge(base: dict, new: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in new.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str | pathlib.Path) -> Config:
    path = pathlib.Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_key = "_base_" if "_base_" in cfg else "_BASE_CONFIG_"
    if base_key in cfg:
        bases = cfg.pop(base_key)
        if isinstance(bases, str):
            bases = [bases]
        merged: dict = {}
        for b in bases:
            bp = pathlib.Path(b)
            if not bp.is_absolute():
                bp = path.parent / bp
            merged = _deep_merge(merged, load_config(bp))
        cfg = _deep_merge(merged, cfg)
    return Config(cfg)


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_preset_overrides(preset, overrides: list[str]):
    """Apply `--set a.b.c=value` dot-path overrides onto a PRESET — a typed
    dataclass (CenterPointConfig, ...) or a dict of them (fused presets:
    {'lidar': ..., 'actr': ..., 'num_cams': ...}). The dataclass analog of
    merge_overrides / pcdet cfg_from_list. Values parse as YAML; lists
    coerce to tuples when the field they replace is a tuple; unknown paths
    raise KeyError."""
    import dataclasses

    def set_path(obj, parts, value):
        if not parts:
            if isinstance(obj, tuple) and isinstance(value, list):
                return tuple(value)
            return value
        head = parts[0]
        if isinstance(obj, dict):
            if head not in obj:
                raise KeyError(f"override path {head!r} not in {sorted(obj)}")
            out = dict(obj)
            out[head] = set_path(obj[head], parts[1:], value)
            return out
        if dataclasses.is_dataclass(obj):
            if not hasattr(obj, head):
                raise KeyError(
                    f"override path {head!r} not a field of "
                    f"{type(obj).__name__}"
                )
            return dataclasses.replace(
                obj, **{head: set_path(getattr(obj, head), parts[1:], value)}
            )
        raise KeyError(
            f"cannot descend into {type(obj).__name__} at {head!r}"
        )

    for kv in overrides:
        if "=" not in kv:
            raise ValueError(f"--set expects key=value, got {kv!r}")
        key, val = kv.split("=", 1)
        preset = set_path(preset, key.split("."), _parse_value(val))
    return preset


def merge_overrides(cfg: Config, overrides: Mapping[str, str] | list[str]) -> Config:
    """Apply dot-path overrides: ['model.head.nms_thresh=0.2', ...] or a
    mapping. Mirrors pcdet cfg_from_list / mmcv DictAction."""
    if isinstance(overrides, Mapping):
        items = overrides.items()
    else:
        items = [kv.split("=", 1) for kv in overrides]
    out = Config(copy.deepcopy(dict(cfg)))
    for key, val in items:
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = _parse_value(val) if isinstance(val, str) else val
    return out
