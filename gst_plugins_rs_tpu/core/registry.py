"""Element registry: name -> element class (gst registry analog).

Reference: gst::Element::register(name, rank, type) per plugin
(audio/audiofx/src/lib.rs:23-46).
"""
from __future__ import annotations

from typing import Dict, List, Optional

_REGISTRY: Dict[str, type] = {}
_RANKS: Dict[str, int] = {}


def register(cls=None, *, rank: int = 0):
    """Class decorator: register an Element subclass under its ELEMENT_NAME."""

    def _do(klass):
        name = klass.ELEMENT_NAME
        if not name:
            raise ValueError(f"{klass} has no ELEMENT_NAME")
        _REGISTRY[name] = klass
        _RANKS[name] = rank
        return klass

    if cls is not None:
        return _do(cls)
    return _do


def element_factory_make(name: str, instance_name: Optional[str] = None):
    if name not in _REGISTRY:
        raise KeyError(f"no such element factory: {name!r} (known: {sorted(_REGISTRY)})")
    return _REGISTRY[name](instance_name)


def factory_exists(name: str) -> bool:
    return name in _REGISTRY


def list_factories() -> List[str]:
    return sorted(_REGISTRY)


def factory_class(name: str) -> type:
    return _REGISTRY[name]


__all__ = ["register", "element_factory_make", "factory_exists", "list_factories", "factory_class"]
