"""Caps: media-type capability descriptions and negotiation algebra.

TPU-native rebuild of the GStreamer caps model used throughout the reference
(e.g. pad templates in /root/reference/audio/audiofx/src/audioecho/imp.rs:238-246).
A `Caps` is an ordered list of `Structure`s; each structure has a media-type
name ("audio/x-raw", "video/x-raw", ...) and fields whose values are either
concrete, a list of choices, or a numeric range.  Negotiation = structure-wise
intersection, then fixation picks a single concrete structure.
"""
from __future__ import annotations

from fractions import Fraction
from typing import Any, Dict, Iterable, List, Optional


class IntRange:
    """Inclusive integer range, e.g. rate = IntRange(1, 2_822_400)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: int, hi: int):
        if lo > hi:
            raise ValueError(f"empty IntRange [{lo}, {hi}]")
        self.lo = int(lo)
        self.hi = int(hi)

    def __repr__(self):
        return f"[{self.lo}, {self.hi}]"

    def __eq__(self, other):
        return isinstance(other, IntRange) and (self.lo, self.hi) == (other.lo, other.hi)

    def __hash__(self):
        return hash(("IntRange", self.lo, self.hi))

    def contains(self, v: int) -> bool:
        return self.lo <= v <= self.hi


class ValueList:
    """Ordered list of allowed concrete values, e.g. format = {F32, F64}."""

    __slots__ = ("values",)

    def __init__(self, values: Iterable[Any]):
        self.values = tuple(values)
        if not self.values:
            raise ValueError("empty ValueList")

    def __repr__(self):
        return "{ " + ", ".join(str(v) for v in self.values) + " }"

    def __eq__(self, other):
        return isinstance(other, ValueList) and self.values == other.values

    def __hash__(self):
        return hash(("ValueList",) + self.values)


def _intersect_value(a: Any, b: Any) -> Optional[Any]:
    """Intersect two field values; None means empty intersection."""
    if isinstance(a, ValueList) and isinstance(b, ValueList):
        common = [v for v in a.values if v in b.values]
        if not common:
            return None
        return common[0] if len(common) == 1 else ValueList(common)
    if isinstance(a, ValueList):
        sub = [v for v in a.values if _intersect_value(v, b) is not None]
        if not sub:
            return None
        return sub[0] if len(sub) == 1 else ValueList(sub)
    if isinstance(b, ValueList):
        return _intersect_value(b, a)
    if isinstance(a, IntRange) and isinstance(b, IntRange):
        lo, hi = max(a.lo, b.lo), min(a.hi, b.hi)
        if lo > hi:
            return None
        return lo if lo == hi else IntRange(lo, hi)
    if isinstance(a, IntRange):
        if isinstance(b, int) and a.contains(b):
            return b
        return None
    if isinstance(b, IntRange):
        return _intersect_value(b, a)
    if a == b:
        return a
    return None


def _is_fixed_value(v: Any) -> bool:
    return not isinstance(v, (IntRange, ValueList))


def _fixate_value(v: Any, hint: Any = None) -> Any:
    if isinstance(v, ValueList):
        if hint is not None:
            for c in v.values:
                if c == hint:
                    return c
        return v.values[0]
    if isinstance(v, IntRange):
        if hint is not None and isinstance(hint, int):
            return min(max(hint, v.lo), v.hi)
        return v.lo
    return v


class Structure:
    """A named field dict. Mirrors gst::Structure."""

    def __init__(self, name: str, **fields: Any):
        self.name = name
        self.fields: Dict[str, Any] = dict(fields)

    def __repr__(self):
        fs = ", ".join(f"{k}={v!r}" for k, v in self.fields.items())
        return f"{self.name}({fs})" if fs else self.name

    def __eq__(self, other):
        return (
            isinstance(other, Structure)
            and self.name == other.name
            and self.fields == other.fields
        )

    def copy(self) -> "Structure":
        return Structure(self.name, **self.fields)

    def get(self, key: str, default: Any = None) -> Any:
        return self.fields.get(key, default)

    def __getitem__(self, key: str) -> Any:
        return self.fields[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self.fields[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self.fields

    def is_fixed(self) -> bool:
        return all(_is_fixed_value(v) for v in self.fields.values())

    def intersect(self, other: "Structure") -> Optional["Structure"]:
        if self.name != other.name:
            return None
        out = Structure(self.name)
        keys = dict(self.fields)
        for k, bv in other.fields.items():
            if k in keys:
                iv = _intersect_value(keys.pop(k), bv)
                if iv is None:
                    return None
                out.fields[k] = iv
            else:
                out.fields[k] = bv
        out.fields.update(keys)
        return out

    def fixate(self, hints: Optional[Dict[str, Any]] = None) -> "Structure":
        hints = hints or {}
        out = Structure(self.name)
        for k, v in self.fields.items():
            out.fields[k] = _fixate_value(v, hints.get(k))
        return out


class Caps:
    """Ordered list of Structures, or ANY/EMPTY sentinels."""

    def __init__(self, structures: Optional[Iterable[Structure]] = None, any_: bool = False):
        self.any = bool(any_)
        self.structures: List[Structure] = list(structures or [])
        if self.any and self.structures:
            raise ValueError("ANY caps cannot carry structures")

    # -- constructors ------------------------------------------------------
    @staticmethod
    def new_any() -> "Caps":
        return Caps(any_=True)

    @staticmethod
    def new_empty() -> "Caps":
        return Caps()

    @staticmethod
    def builder(name: str, **fields: Any) -> "Caps":
        return Caps([Structure(name, **fields)])

    # -- predicates --------------------------------------------------------
    def is_any(self) -> bool:
        return self.any

    def is_empty(self) -> bool:
        return (not self.any) and not self.structures

    def is_fixed(self) -> bool:
        return (not self.any) and len(self.structures) == 1 and self.structures[0].is_fixed()

    # -- algebra -----------------------------------------------------------
    def intersect(self, other: "Caps") -> "Caps":
        if self.any:
            return Caps([s.copy() for s in other.structures], any_=other.any)
        if other.any:
            return Caps([s.copy() for s in self.structures])
        out: List[Structure] = []
        for a in self.structures:
            for b in other.structures:
                i = a.intersect(b)
                if i is not None and i not in out:
                    out.append(i)
        return Caps(out)

    def can_intersect(self, other: "Caps") -> bool:
        return not self.intersect(other).is_empty()

    def is_subset(self, superset: "Caps") -> bool:
        if superset.any:
            return True
        if self.any:
            return False
        for s in self.structures:
            i = Caps([s]).intersect(superset)
            if i.is_empty():
                return False
        return True

    def fixate(self, hints: Optional[Dict[str, Any]] = None) -> "Caps":
        if self.any or not self.structures:
            raise ValueError(f"cannot fixate {self!r}")
        return Caps([self.structures[0].fixate(hints)])

    def copy(self) -> "Caps":
        return Caps([s.copy() for s in self.structures], any_=self.any)

    # -- access ------------------------------------------------------------
    def structure(self, idx: int = 0) -> Structure:
        return self.structures[idx]

    def __len__(self):
        return len(self.structures)

    def __iter__(self):
        return iter(self.structures)

    def __eq__(self, other):
        return (
            isinstance(other, Caps)
            and self.any == other.any
            and self.structures == other.structures
        )

    def __repr__(self):
        if self.any:
            return "Caps(ANY)"
        if not self.structures:
            return "Caps(EMPTY)"
        return "Caps[" + "; ".join(repr(s) for s in self.structures) + "]"


__all__ = ["Caps", "Structure", "IntRange", "ValueList", "Fraction"]
