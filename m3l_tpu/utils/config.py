"""Hydra-style config system (YAML tree + ``_target_`` instantiation).

Capability parity with the reference's Hydra/OmegaConf usage (reference
config/ tree; SURVEY.md §2.6, §5 config system): nested YAML configs with

* ``_target_: pkg.module.Class`` object instantiation (``_partial_: true``
  returns a functools.partial),
* a ``defaults:`` list composing group files (``model: mae_vit`` loads
  ``model/mae_vit.yaml`` into the ``model`` key; later entries and the file's
  own body override earlier ones),
* ``${a.b.c}`` interpolation (with ``${key:default}`` fallback syntax),
* dotted command-line overrides (``model.encoder.embed_dim=384``).

Implemented without Hydra/OmegaConf (not available in this environment) on
top of PyYAML.
"""
from __future__ import annotations

import functools
import importlib
import os
import re
from typing import Any, Optional

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _lookup(cfg: dict, dotted: str, default=...) -> Any:
    cur: Any = cfg
    for part in dotted.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            if default is ...:
                raise KeyError(dotted)
            return default
    return cur


def _interpolate(node: Any, root: dict, _depth: int = 0) -> Any:
    """Recursive ``${...}`` resolution: looked-up values may themselves
    contain interpolations (e.g. ckpt_dir -> ${experiment_name} ->
    ${sensor}_${ssl_name}); depth-capped against reference cycles."""
    if _depth > 16:
        raise RecursionError("interpolation cycle detected")

    def resolve(expr: str):
        if ":" in expr:
            key, default = expr.split(":", 1)
            val = _lookup(root, key.strip(), yaml.safe_load(default))
        else:
            val = _lookup(root, expr.strip())
        return _interpolate(val, root, _depth + 1)

    if isinstance(node, str):
        full = _INTERP.fullmatch(node.strip())
        if full:
            return resolve(full.group(1))
        return _INTERP.sub(lambda m: str(resolve(m.group(1))), node)
    if isinstance(node, dict):
        return {k: _interpolate(v, root, _depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root, _depth) for v in node]
    return node


def load_config(path: str, overrides: Optional[list[str]] = None, _top: bool = True) -> dict:
    """Load a YAML config, composing its ``defaults:`` list relative to the
    config root directory, then apply dotted overrides and interpolation.

    Interpolation runs once, at the top-level call, so overrides of
    interpolated keys (e.g. ``model_size=base``) propagate into groups."""
    path = os.path.abspath(path)
    root_dir = os.path.dirname(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    defaults = cfg.pop("defaults", [])

    def _resolve(rel: str) -> str:
        # group files resolve against this file's dir, then walk up the
        # ancestors to the config root (so deeply nested files like
        # experiment/downstream_task/force/digit_mae.yaml can select
        # top-level groups such as task/... or paths/...)
        base = root_dir
        seen = set()
        while base and base not in seen:
            seen.add(base)
            cand = os.path.join(base, rel)
            if os.path.isfile(cand):
                return cand
            base = os.path.dirname(base)
        raise FileNotFoundError(f"config group file {rel!r} (from {path})")

    composed: dict = {}
    for entry in defaults:
        if entry == "_self_":
            composed = _deep_merge(composed, cfg)
            cfg = {}
            continue
        if isinstance(entry, dict):
            ((group, name),) = entry.items()
            if name is None:
                continue
            sub = load_config(_resolve(os.path.join(group, f"{name}.yaml")), _top=False)
            # group selection REPLACES the group's content (Hydra semantics)
            composed = dict(composed)
            composed[group] = sub
        else:
            sub = load_config(_resolve(f"{entry}.yaml"), _top=False)
            composed = _deep_merge(composed, sub)
    composed = _deep_merge(composed, cfg)
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = composed
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    if not _top:
        return composed
    return _interpolate(composed, composed)


def _import_target(target: str):
    module, _, attr = target.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def instantiate(cfg: Any, **kwargs) -> Any:
    """Recursively instantiate ``_target_`` nodes (Hydra semantics)."""
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) for k, v in cfg.items()}
    cfg = dict(cfg)
    target = _import_target(cfg.pop("_target_"))
    partial = bool(cfg.pop("_partial_", False))
    args = {k: instantiate(v) for k, v in cfg.items()}
    args.update(kwargs)
    if partial:
        return functools.partial(target, **args)
    return target(**args)


def print_config(cfg: dict, indent: int = 0) -> str:
    """Pretty config tree (reference tactile_ssl/utils/logging.py:44-102
    prints via rich; this is a dependency-free equivalent). Returns the
    string and prints it."""
    lines = []

    def walk(node, depth):
        pad = "  " * depth
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, (dict, list)) and v:
                    lines.append(f"{pad}{k}:")
                    walk(v, depth + 1)
                else:
                    lines.append(f"{pad}{k}: {v}")
        elif isinstance(node, list):
            for v in node:
                lines.append(f"{pad}- {v}")

    walk(cfg, indent)
    out = "\n".join(lines)
    print(out)
    return out
