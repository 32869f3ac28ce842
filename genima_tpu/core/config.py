"""Minimal hydra-compatible configuration system.

The reference uses hydra/OmegaConf for the render/controller/eval stages and
argparse for the diffusion trainers (reference: ``render/render_data.py:436``,
``controller/train_act.py:282``, ``diffusion/train_controlnet_genima.py:53``).
This module provides the subset the framework needs without the hydra
dependency:

* YAML config files with nested dicts,
* ``${a.b}`` interpolation (OmegaConf-style),
* dotted CLI overrides (``a.b.c=value``, ``+new.key=value``),
* ``_target_``-based object instantiation,
* config save/round-trip (the render stage snapshots its config into the
  generated dataset; eval re-reads the saved train config).
"""

from __future__ import annotations

import copy
import importlib
import re
from pathlib import Path
from typing import Any, Callable

import yaml


class Config(dict):
    """A dict with attribute access and deep-merge, like a tiny OmegaConf."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    @staticmethod
    def from_dict(d: dict) -> "Config":
        return _wrap(d)

    def to_dict(self) -> dict:
        return _unwrap(self)


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return [_wrap(v) for v in obj]
    return obj


def _unwrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_unwrap(v) for v in obj]
    return obj


def load_yaml(path: str | Path) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _wrap(data)


def save_yaml(cfg: Config | dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_unwrap(cfg), f, sort_keys=False)


def merge(base: dict, override: dict) -> Config:
    """Deep merge; values in ``override`` win. Lists are replaced, not merged."""
    out = copy.deepcopy(_wrap(base))
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(_wrap(v))
    return out


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML semantics ('5'→int, 'null'→None)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply hydra-style dotted overrides. ``+key=value`` adds new keys."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key=value, got: {ov!r}")
        key, _, raw = ov.partition("=")
        additive = key.startswith("+")
        key = key.lstrip("+~")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node:
                if not additive:
                    raise KeyError(f"Unknown config key {key!r} (use +{key} to add)")
                node[p] = Config()
            node = node[p]
        leaf = parts[-1]
        if leaf not in node and not additive:
            raise KeyError(f"Unknown config key {key!r} (use +{key} to add)")
        node[leaf] = _parse_value(raw)
    return cfg


_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(root: dict, dotted: str) -> Any:
    node: Any = root
    for p in dotted.split("."):
        node = node[p]
    return node


def resolve(cfg: Config) -> Config:
    """Resolve ``${a.b}`` interpolations against the config root."""
    root = copy.deepcopy(cfg)

    def _resolve_value(v: Any, depth: int = 0) -> Any:
        if depth > 16:
            raise ValueError("Interpolation recursion limit exceeded")
        if isinstance(v, str):
            full = _INTERP_RE.fullmatch(v.strip())
            if full:  # whole-string interpolation preserves type
                return _resolve_value(_lookup(root, full.group(1)), depth + 1)
            return _INTERP_RE.sub(
                lambda m: str(_resolve_value(_lookup(root, m.group(1)), depth + 1)), v
            )
        return v

    def _walk(node: Any) -> Any:
        if isinstance(node, dict):
            return Config({k: _walk(v) for k, v in node.items()})
        if isinstance(node, list):
            return [_walk(v) for v in node]
        return _resolve_value(node)

    return _walk(root)


def load_config(
    path: str | Path, overrides: list[str] | None = None, resolve_interp: bool = True
) -> Config:
    """Load a YAML config, apply CLI overrides, resolve interpolations."""
    cfg = load_yaml(path)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if resolve_interp:
        cfg = resolve(cfg)
    return cfg


def import_object(target: str) -> Any:
    """Import ``pkg.module.Object`` (hydra ``_target_`` semantics)."""
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ValueError(f"_target_ must be fully qualified, got {target!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(cfg: dict, *args: Any, **kwargs: Any) -> Any:
    """Instantiate an object from a ``_target_`` config node.

    Mirrors ``hydra.utils.instantiate`` (reference:
    ``controller/eval_genima.py:86-89`` instantiates diffusion agents this
    way; ``controller/train_act.py:136-146`` the method). ``_partial_: true``
    returns a ``functools.partial``.
    """
    import functools

    if not isinstance(cfg, dict) or "_target_" not in cfg:
        raise ValueError(f"instantiate() needs a dict with _target_, got {cfg!r}")
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    partial = cfg.pop("_partial_", False)
    cls: Callable = import_object(target)
    call_kwargs = {k: _unwrap_preserving_targets(v) for k, v in cfg.items()}
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(cls, *args, **call_kwargs)
    return cls(*args, **call_kwargs)


def _unwrap_preserving_targets(v: Any) -> Any:
    """Recursively instantiate nested ``_target_`` nodes."""
    if isinstance(v, dict):
        if "_target_" in v:
            return instantiate(v)
        return Config({k: _unwrap_preserving_targets(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_unwrap_preserving_targets(x) for x in v]
    return v


def parse_cli(argv: list[str]) -> tuple[list[str], dict]:
    """Split argv into hydra-style overrides and special flags.

    Returns (overrides, flags) where flags captures ``--config-path`` /
    ``--config-name`` if present.
    """
    overrides: list[str] = []
    flags: dict = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--config-path", "--config-name", "-cp", "-cn"):
            key = "config_path" if a in ("--config-path", "-cp") else "config_name"
            flags[key] = argv[i + 1]
            i += 2
        elif a.startswith("--"):
            flags[a.lstrip("-").replace("-", "_")] = True
            i += 1
        else:
            overrides.append(a)
            i += 1
    return overrides, flags
