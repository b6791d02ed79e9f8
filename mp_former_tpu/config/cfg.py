"""Yacs-style hierarchical config for MP-Former TPU.

Re-implements the subset of yacs `CfgNode` semantics the reference relies on
(see reference train_net.py:356-370): attribute access, `merge_from_file` with
``_BASE_`` YAML inheritance, `merge_from_list` dotted-key CLI overrides, and
`freeze`/`defrost`. Pure Python — no yacs/detectron2 dependency.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List

import yaml

_VALID_TYPES = (int, float, bool, str, type(None), tuple, list)

BASE_KEY = "_BASE_"


class CfgNode(dict):
    """A dict subclass with attribute access, freezing and YAML merging."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        init_dict = init_dict or {}
        init_dict = self._create_config_tree(init_dict)
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False

    @classmethod
    def _create_config_tree(cls, dic: Dict[str, Any]) -> Dict[str, Any]:
        dic = copy.deepcopy(dic)
        for k, v in dic.items():
            if isinstance(v, dict):
                dic[k] = cls(v)
            elif not isinstance(v, _VALID_TYPES):
                raise ValueError(f"Invalid config value type {type(v)} for key {k}")
        return dic

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Config is frozen; cannot set {name}")
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Config is frozen; cannot set {name}")
        super().__setitem__(name, value)

    # -- freeze / clone ---------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, flag: bool) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = flag
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo) -> "CfgNode":
        out = CfgNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        out.__dict__[CfgNode.IMMUTABLE] = False
        return out

    # -- merging ----------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self)

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = True) -> None:
        loaded = _load_yaml_with_base(cfg_filename)
        _merge_a_into_b(CfgNode(loaded), self)

    def merge_from_list(self, cfg_list: List[str]) -> None:
        """Merge ``["KEY.SUBKEY", value, ...]`` pairs (CLI `opts`)."""
        flags = [x for x in cfg_list if isinstance(x, str) and x.startswith("--")]
        if flags:
            raise ValueError(
                f"CLI flags {flags} appeared after config overrides; place "
                "flags like --eval-only BEFORE the KEY VALUE override list")
        assert len(cfg_list) % 2 == 0, f"Override list has odd length: {cfg_list}"
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            key_parts = full_key.split(".")
            d = self
            for sub in key_parts[:-1]:
                if sub not in d:
                    d[sub] = CfgNode()
                d = d[sub]
            leaf = key_parts[-1]
            old = d.get(leaf, None)
            d[leaf] = _decode_value(v, old)

    # -- serialization ----------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False, sort_keys=True)

    def __str__(self) -> str:
        return self.dump()


def _coerce_to_old_type(parsed: Any, old: Any, raw: Any) -> Any:
    """yacs-style type reconciliation against the existing value."""
    if old is not None and parsed is not None:
        if isinstance(old, tuple) and isinstance(parsed, list):
            parsed = tuple(parsed)
        elif isinstance(old, str) and not isinstance(parsed, str) \
                and isinstance(raw, str):
            # string key: keep the raw CLI string ('2024' stays '2024')
            parsed = raw
        elif isinstance(old, bool) and isinstance(parsed, int) and not isinstance(parsed, bool):
            parsed = bool(parsed)
        elif isinstance(old, float) and isinstance(parsed, int):
            parsed = float(parsed)
    return parsed


def _decode_value(v: Any, old: Any) -> Any:
    """Parse a CLI string value (yacs _decode_cfg_value: python literal or
    the raw string — no yaml re-parse, which would corrupt 'no'/'on'/dates).
    YAML-file values are already typed and must NOT pass through this."""
    if not isinstance(v, str):
        return _coerce_to_old_type(v, old, v)
    import ast

    try:
        parsed = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        parsed = v
    return _coerce_to_old_type(parsed, old, v)


def _merge_a_into_b(a: CfgNode, b: CfgNode) -> None:
    for k, v_a in a.items():
        if k in b and isinstance(b[k], CfgNode) and isinstance(v_a, (dict, CfgNode)):
            _merge_a_into_b(CfgNode(dict(v_a)) if not isinstance(v_a, CfgNode) else v_a, b[k])
        else:
            if isinstance(v_a, (dict, CfgNode)):
                v_a = CfgNode(dict(v_a))
            old = b.get(k, None)
            # yacs decodes file values with literal_eval too (yaml parses
            # d2-style "(640, 672)" tuples as strings); _decode_value keeps
            # raw strings for string keys and never yaml-re-parses
            if not isinstance(v_a, (dict, CfgNode)):
                v_a = _decode_value(v_a, old)
            b[k] = copy.deepcopy(v_a)


class _CfgLoader(yaml.SafeLoader):
    """SafeLoader + the `!!python/object/apply:eval` tag detectron2 configs use
    (e.g. reference Base-Cityscapes-*.yaml MIN_SIZE_TRAIN). The expression is
    evaluated with a minimal namespace — no builtins beyond int/range/min/max."""


def _construct_eval(loader: yaml.SafeLoader, node: yaml.Node) -> Any:
    (expr,) = loader.construct_sequence(node)
    return eval(  # noqa: S307 — restricted namespace
        expr, {"__builtins__": {}}, {"int": int, "range": range, "min": min, "max": max}
    )


_CfgLoader.add_constructor("tag:yaml.org,2002:python/object/apply:eval", _construct_eval)


def _load_yaml_with_base(filename: str) -> Dict[str, Any]:
    """Load YAML honoring ``_BASE_`` recursive inheritance (d2 semantics)."""
    with open(filename, "r") as f:
        cfg = yaml.load(f, Loader=_CfgLoader) or {}
    if BASE_KEY in cfg:
        base_path = cfg.pop(BASE_KEY)
        if not os.path.isabs(base_path):
            base_path = os.path.join(os.path.dirname(filename), base_path)
        base = _load_yaml_with_base(base_path)
        merged = CfgNode(base)
        _merge_a_into_b(CfgNode(cfg), merged)
        return merged.to_dict()
    return cfg
