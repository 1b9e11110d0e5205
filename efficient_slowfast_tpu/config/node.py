"""Minimal yacs/fvcore-style config node, written fresh for the TPU build.

Provides the same user-facing surface the reference relies on
(reference: slowfast/config/defaults.py uses fvcore.common.config.CfgNode):
attribute access, YAML file merge, CLI key-value list merge, freezing, and
round-trip dump. Implementation is a plain dict subclass — no vendored fvcore.
"""

from __future__ import annotations

import copy
from typing import Any, List

import yaml

_FROZEN = "__cfg_frozen__"


class CfgNode(dict):
    """Attribute-accessible nested config dict with freeze/merge semantics."""

    def __init__(self, init_dict: dict | None = None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no key '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"Cannot set '{name}' on a frozen config")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __delattr__(self, name: str) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"Cannot delete '{name}' on a frozen config")
        del self[name]

    # -- freeze -----------------------------------------------------------
    def freeze(self) -> None:
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, _FROZEN)

    # -- merge ------------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge(other, self, [])

    def merge_from_file(self, filename: str, allow_unsafe: bool = False) -> None:
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self.merge_from_other_cfg(CfgNode(loaded))

    def merge_from_list(self, opts: List[Any]) -> None:
        """Merge ``[KEY, value, KEY, value, ...]`` pairs (the CLI `opts` tail)."""
        if len(opts) % 2 != 0:
            raise ValueError(f"Override list has odd length: {opts}")
        for full_key, v in zip(opts[0::2], opts[1::2]):
            keys = full_key.split(".")
            d = self
            for sub in keys[:-1]:
                if sub not in d:
                    raise KeyError(f"Non-existent config key: {full_key}")
                d = d[sub]
            last = keys[-1]
            if last not in d:
                raise KeyError(f"Non-existent config key: {full_key}")
            d[last] = _coerce(v, d[last], full_key)

    # -- io ---------------------------------------------------------------
    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False, sort_keys=True)

    def clone(self) -> "CfgNode":
        c = CfgNode(self.to_dict())
        return c

    def static(self) -> "CfgStatic":
        """Hashable immutable view for flax Module fields / jit static args."""
        return CfgStatic(self.to_dict())

    def __deepcopy__(self, memo):
        return CfgNode(self.to_dict())

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"CfgNode({dict.__repr__(self)})"


def _to_hashable(v: Any) -> Any:
    if isinstance(v, dict):
        return CfgStatic(v)
    if isinstance(v, (list, tuple)):
        return tuple(_to_hashable(x) for x in v)
    return v


class CfgStatic:
    """Immutable, hashable namespace view of a CfgNode.

    Suitable as a static field on a flax Module (flax would coerce a dict
    subclass into FrozenDict, losing attribute access) and as a jit static
    argument. Lists become tuples recursively.
    """

    def __init__(self, d: dict):
        object.__setattr__(self, "_items", tuple(sorted(
            (k, _to_hashable(v)) for k, v in d.items()
        )))
        for k, v in self._items:
            object.__setattr__(self, k, v)

    def __setattr__(self, k, v):
        raise AttributeError("CfgStatic is immutable")

    def __eq__(self, other):
        return isinstance(other, CfgStatic) and self._items == other._items

    def __hash__(self):
        return hash(self._items)

    def __repr__(self):  # pragma: no cover
        return f"CfgStatic({dict(self._items)!r})"

    def to_cfg(self) -> "CfgNode":
        def back(v):
            if isinstance(v, CfgStatic):
                return {k: back(x) for k, x in v._items}
            if isinstance(v, tuple):
                return [back(x) for x in v]
            return v
        return CfgNode(back(self))


def _merge(src: CfgNode, dst: CfgNode, path: List[str]) -> None:
    for k, v in src.items():
        full = ".".join(path + [k])
        if k not in dst:
            raise KeyError(f"Non-existent config key: {full}")
        if isinstance(v, CfgNode) and isinstance(dst[k], CfgNode):
            _merge(v, dst[k], path + [k])
        else:
            dst[k] = _coerce(v, dst[k], full)


def _coerce(value: Any, existing: Any, key: str) -> Any:
    """Coerce CLI string values to the type already present at ``key``."""
    if isinstance(value, str) and not isinstance(existing, str):
        try:
            value = yaml.safe_load(value)
        except yaml.YAMLError:
            pass
    # pyyaml (YAML 1.1) parses bare scientific notation ("1e-4") as a
    # STRING — the classic gotcha. When the default is numeric, parse it.
    if isinstance(value, str) and isinstance(existing, float):
        try:
            value = float(value)
        except ValueError:
            raise ValueError(
                f"Cannot coerce {value!r} to float for key {key}")
    elif (isinstance(value, str) and isinstance(existing, int)
          and not isinstance(existing, bool)):
        try:
            f = float(value)
        except ValueError:
            raise ValueError(
                f"Cannot coerce {value!r} to int for key {key}")
        value = int(f) if f.is_integer() else f
    if (isinstance(value, list) and isinstance(existing, (list, tuple))
            and any(isinstance(v, str) for v in value)):
        def _parse(v):
            try:
                return float(v)
            except ValueError:
                return None

        numeric_default = existing and all(
            isinstance(e, (int, float)) and not isinstance(e, bool)
            for e in existing
        )
        if numeric_default:
            # known-numeric target: fail loudly, matching the scalar path
            for v in value:
                if isinstance(v, str) and _parse(v) is None:
                    raise ValueError(
                        f"Cannot coerce {v!r} to float in list key {key}")
            # mirror the scalar rule per element: an all-int default (e.g. a
            # stride/epoch list) keeps int for integral values so downstream
            # range()/indexing doesn't see 8.0
            all_int = all(isinstance(e, int) and not isinstance(e, bool)
                          for e in existing)

            def _coerce(v):
                if not isinstance(v, str):
                    return v
                f = float(v)
                return int(f) if all_int and f.is_integer() else f

            value = [_coerce(v) for v in value]
        elif not existing:
            # empty default (e.g. SOLVER.LRS = []): element types unknown —
            # coerce only when EVERY element is numeric, so quoted string
            # lists (file names, even numeric-looking ones mixed with
            # paths) pass through untouched
            if all((not isinstance(v, str)
                    and isinstance(v, (int, float)))
                   or (isinstance(v, str) and _parse(v) is not None)
                   for v in value):
                value = [float(v) if isinstance(v, str) else v for v in value]
    if existing is None or value is None:
        return value
    if isinstance(existing, bool) and not isinstance(value, bool):
        if isinstance(value, str):
            low = value.lower()
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
        raise ValueError(f"Cannot coerce {value!r} to bool for key {key}")
    if isinstance(existing, float) and isinstance(value, int):
        return float(value)
    if isinstance(existing, (list, tuple)) and isinstance(value, (list, tuple)):
        return list(value)
    if type(existing) is not type(value) and not isinstance(value, type(existing)):
        # permit int where float lives, handled above; otherwise be permissive
        # but keep ints as ints when existing is int and value is float-integral
        if isinstance(existing, int) and isinstance(value, float) and value.is_integer():
            return int(value)
    return value
