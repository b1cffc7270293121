"""Config system: YAML layering + dotted CLI overrides + scope registry.

Capability match for the reference's OmegaConf-based parser
(contrastyou/configure/omega_parser.py:13-196) and the legacy manager
(configure/manager.py, dictionary_utils.py), built on plain PyYAML since the
rebuild avoids the omegaconf dependency:

- ``-p/--path a.yaml b.yaml`` merges YAML files left-to-right.
- ``-o/--opt a.b=c`` overrides an *existing* key (strict, like OmegaConf struct
  mode); ``+a.b=c`` adds a new key; ``~a.b`` deletes a key.
- Values are parsed with ``yaml.safe_load`` so ``true``/``1e-3``/``[1,2]`` get
  proper types.
- ``register_config``/``get_config`` give deep code access to a named config
  scope (ref: configure/manager.py:110 ``get_config``).
- ``summary`` renders a base/CLI/merged three-column diff table
  (ref: omega_parser.py:187-195) without prettytable.
"""
from __future__ import annotations

import argparse
import copy
import sys
from pathlib import Path
from typing import Any, Iterable, Mapping, Sequence

import yaml


class Config(dict):
    """Nested dict with attribute access. Missing attribute -> AttributeError."""

    def __init__(self, data: Mapping | None = None):
        super().__init__()
        for k, v in dict(data or {}).items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, Config):
            value = Config(value)
        super().__setitem__(key, value)

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:
            raise AttributeError(item) from e

    def __setattr__(self, key, value):
        self[key] = value

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    # --- dotted access -------------------------------------------------
    def select(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def update_dotted(self, dotted: str, value, *, allow_new: bool = False):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node:
                if not allow_new:
                    raise KeyError(
                        f"key '{dotted}' not in config; prefix with '+' to add new keys")
                node[part] = Config()
            node = node[part]
            if not isinstance(node, Mapping):
                raise KeyError(f"'{dotted}': '{part}' is a leaf, cannot descend")
        leaf = parts[-1]
        if leaf not in node and not allow_new:
            raise KeyError(
                f"key '{dotted}' not in config; prefix with '+' to add new keys")
        node[leaf] = value

    def delete_dotted(self, dotted: str):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            node = node[part]
        del node[parts[-1]]


def merge(base: Mapping, override: Mapping) -> Config:
    """Recursive dict merge; override wins; dicts merge, everything else replaces
    (ref: configure/dictionary_utils.py:20 ``dictionary_merge_by_hierachy``)."""
    out = Config(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


# reference-compatible alias
def dictionary_merge_by_hierachy(base, override):
    return merge(base, override or {})


def extract_params_with_key_prefix(config: Mapping, prefix: str) -> Config:
    """Pull out keys whose leaf name starts with ``prefix``, stripping the prefix —
    used to split one CLI into pretrain (``pre_``) and finetune (``ft_``) configs
    (ref: configure/dictionary_utils.py:107)."""
    out = Config()
    for k, v in config.items():
        if isinstance(v, Mapping):
            sub = extract_params_with_key_prefix(v, prefix)
            if sub:
                out[k] = sub
        elif k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def yaml_load(path: str | Path) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f) or {})


def yaml_write(config: Mapping, save_dir: str | Path, filename: str = "config.yaml") -> str:
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    target = Path(save_dir) / filename
    data = config.to_dict() if isinstance(config, Config) else dict(config)
    with open(target, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)
    return str(target)


def _parse_value(raw: str):
    try:
        value = yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw
    if isinstance(value, str):
        # YAML 1.1 misses bare scientific notation like `1e-3`
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def apply_overrides(config: Config, tokens: Iterable[str]) -> Config:
    """Apply ``a.b=c`` / ``+a.b=c`` / ``~a.b`` tokens
    (ref: omega_parser.py:47-76 ``_cli_merge``)."""
    out = config.copy()
    for tok in tokens:
        if tok.startswith("~"):
            out.delete_dotted(tok[1:])
        elif "=" in tok:
            key, raw = tok.split("=", 1)
            allow_new = key.startswith("+")
            out.update_dotted(key.lstrip("+"), _parse_value(raw), allow_new=allow_new)
        else:
            raise ValueError(f"malformed override '{tok}' (want key=value, +key=value or ~key)")
    return out


def _flatten(cfg: Mapping, prefix: str = "") -> dict[str, Any]:
    flat: dict[str, Any] = {}
    for k, v in cfg.items():
        dotted = f"{prefix}{k}"
        if isinstance(v, Mapping):
            flat.update(_flatten(v, dotted + "."))
        else:
            flat[dotted] = v
    return flat


def summary_table(base: Mapping, merged: Mapping) -> str:
    """Three-column base/merged diff (ref: omega_parser.py:187-195)."""
    fb, fm = _flatten(base), _flatten(merged)
    keys = sorted(set(fb) | set(fm))
    rows = [("key", "base", "merged")]
    for k in keys:
        b, m = fb.get(k, "<absent>"), fm.get(k, "<deleted>")
        rows.append((k, str(b), str(m) + ("  *" if b != m else "")))
    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    lines = []
    for i, r in enumerate(rows):
        lines.append(" | ".join(c.ljust(w) for c, w in zip(r, widths)))
        if i == 0:
            lines.append("-+-".join("-" * w for w in widths))
    return "\n".join(lines)


__config_dictionary__: dict[str, Config] = {}


def register_config(config: Config, scope: str = "base") -> None:
    __config_dictionary__[scope] = config


def get_config(scope: str = "base") -> Config:
    """Global config access for deep code (ref: configure/manager.py:110)."""
    return __config_dictionary__[scope]


class ConfigParser:
    """CLI-facing parser: ``prog -p base.yaml hook.yaml -o A.b=1 +C.d=2 ~E``
    (ref: omega_parser.py:118-130)."""

    def __init__(self, default_yaml: str | Path | None = None):
        self._default_yaml = default_yaml

    def parse(self, argv: Sequence[str] | None = None,
              scope: str = "base") -> Config:
        argv = list(sys.argv[1:] if argv is None else argv)
        ap = argparse.ArgumentParser(add_help=True)
        ap.add_argument("-p", "--path", nargs="*", default=[],
                        help="yaml config paths merged left-to-right")
        ap.add_argument("-o", "--opt", nargs="*", default=[],
                        help="dotted overrides: a.b=c, +new.key=v, ~delete.key")
        ns, _unknown = ap.parse_known_args(argv)

        paths = list(ns.path)
        if not paths and self._default_yaml is not None:
            paths = [str(self._default_yaml)]
        base = Config()
        for p in paths:
            base = merge(base, yaml_load(p))
        merged = apply_overrides(base, ns.opt)
        self.base, self.merged = base, merged
        register_config(merged, scope)
        return merged

    def summary(self) -> str:
        return summary_table(self.base, self.merged)
