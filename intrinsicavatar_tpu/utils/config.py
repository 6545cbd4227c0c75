"""Minimal hierarchical config system with OmegaConf-style interpolation.

Replaces the reference's Hydra/OmegaConf stack (`configs/config.yaml`,
`utils/misc.py:7-14` in taconite/IntrinsicAvatar) with a dependency-free
equivalent: nested dicts with attribute access, ``${dot.path}`` interpolation
and arithmetic resolvers ``${add:..}``, ``${sub:..}``, ``${mul:..}``,
``${div:..}``, ``${idiv:..}``, plus YAML loading and dotlist CLI overrides.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Mapping


class ConfigNode(dict):
    """A dict with attribute access. Missing keys raise AttributeError."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return super().get(k, default)

    def copy(self) -> "ConfigNode":
        return wrap(copy.deepcopy(dict(self)))


def wrap(obj: Any) -> Any:
    """Recursively convert mappings to ConfigNode."""
    if isinstance(obj, Mapping):
        return ConfigNode({k: wrap(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(wrap(v) for v in obj)
    return obj


def merge(base: Any, override: Any) -> Any:
    """Deep merge ``override`` into ``base`` (override wins)."""
    if isinstance(base, Mapping) and isinstance(override, Mapping):
        out = ConfigNode(dict(base))
        for k, v in override.items():
            out[k] = merge(base[k], v) if k in base else wrap(v)
        return out
    return wrap(override)


_INTERP = re.compile(r"\$\{([^{}]+)\}")


def _lookup(root, path: str):
    node = root
    for part in path.split("."):
        node = node[part]
    return node


_RESOLVERS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "idiv": lambda a, b: int(a // b),
}


def _resolve_value(root, val):
    if not isinstance(val, str):
        return val

    def repl_full(expr: str):
        if ":" in expr:
            name, argstr = expr.split(":", 1)
            args = [_resolve_value(root, a.strip()) for a in argstr.split(",")]
            args = [_coerce(a) if isinstance(a, str) else a for a in args]
            args = [
                _resolve_value(root, _lookup(root, a)) if isinstance(a, str) and _is_path(root, a) else a
                for a in args
            ]
            return _RESOLVERS[name](*args)
        return _resolve_value(root, _lookup(root, expr))

    m = _INTERP.fullmatch(val.strip())
    if m:
        return repl_full(m.group(1))
    # partial interpolation inside a string
    def repl(match):
        return str(repl_full(match.group(1)))

    return _INTERP.sub(repl, val)


def _is_path(root, s: str) -> bool:
    try:
        _lookup(root, s)
        return True
    except (KeyError, TypeError):
        return False


def _coerce(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s in ("true", "True"):
        return True
    if s in ("false", "False"):
        return False
    return s


def resolve(cfg: ConfigNode) -> ConfigNode:
    """Resolve all ``${...}`` interpolations against the config root."""

    def walk(node):
        if isinstance(node, Mapping):
            return ConfigNode({k: walk(v) for k, v in node.items()})
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return _resolve_value(cfg, node)

    # Iterate to fixpoint for chained interpolations.
    out = cfg
    for _ in range(8):
        new = walk(out)
        if new == out:
            break
        out = new
    return out


def load_yaml(path: str) -> ConfigNode:
    import yaml

    with open(path) as f:
        return wrap(yaml.safe_load(f))


def apply_dotlist(cfg: ConfigNode, overrides) -> ConfigNode:
    """Apply ``a.b.c=value`` CLI overrides (values YAML-parsed)."""
    import yaml

    cfg = cfg.copy()
    for item in overrides:
        key, _, raw = item.partition("=")
        val = yaml.safe_load(raw)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], Mapping):
                node[p] = ConfigNode()
            node = node[p]
        node[parts[-1]] = wrap(val)
    return cfg
