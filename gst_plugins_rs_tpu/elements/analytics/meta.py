"""Analytics metadata: TensorMeta + AnalyticsRelationMeta.

Rebuild of the gst-analytics interchange layer (SURVEY.md §1 L4): typed
tensors attached to buffers and object-detection/classification relation
metadata (analytics/burn/src/yoloxinference/imp.rs:458-471,
analytics/analytics/src/yoloxtensordec/imp.rs:398-428).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

from ...core import Meta


class TensorDataType(enum.Enum):
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    INT32 = "int32"
    UINT8 = "uint8"


class TensorDimOrder(enum.Enum):
    ROW_MAJOR = "row-major"
    COL_MAJOR = "col-major"


@dataclass
class Tensor:
    """A named, typed tensor (gst_analytics::Tensor analog).  `data` stays a
    device array until a consumer maps it."""

    id: str  # quark name, e.g. "yolox-out"
    data_type: TensorDataType
    dims: Tuple[int, ...]
    dims_order: TensorDimOrder
    data: Any

    def check(self, id_: str, dtype: TensorDataType, order: TensorDimOrder, dims_pattern) -> bool:
        """Pattern match like typed_tensor(): None entries in dims_pattern are
        wildcards."""
        if self.id != id_ or self.data_type != dtype or self.dims_order != order:
            return False
        if len(dims_pattern) != len(self.dims):
            return False
        return all(p is None or p == d for p, d in zip(dims_pattern, self.dims))


class TensorMeta(Meta):
    api = "tensor"

    def __init__(self, tensors: Optional[List[Tensor]] = None):
        self.tensors: List[Tensor] = list(tensors or [])

    def __repr__(self):
        return f"TensorMeta({[(t.id, t.dims) for t in self.tensors]})"


class RelTypes(enum.Flag):
    NONE = 0
    IS_PART_OF = enum.auto()
    CONTAIN = enum.auto()
    RELATE_TO = enum.auto()


@dataclass
class OdMtd:
    """Object-detection metadata entry."""

    id: int
    object_type: str  # label quark
    x: int
    y: int
    w: int
    h: int
    loc_conf_lvl: float


@dataclass
class ClsMtd:
    """Classification metadata entry (one class)."""

    id: int
    confidence: float
    class_quark: str


class AnalyticsRelationMeta(Meta):
    api = "analytics-relation"

    def __init__(self):
        self._next_id = 0
        self.od: List[OdMtd] = []
        self.cls: List[ClsMtd] = []
        self.relations: List[Tuple[RelTypes, int, int]] = []

    def add_od_mtd(self, object_type: str, x: int, y: int, w: int, h: int, conf: float) -> OdMtd:
        m = OdMtd(self._next_id, object_type, x, y, w, h, conf)
        self._next_id += 1
        self.od.append(m)
        return m

    def add_one_cls_mtd(self, confidence: float, class_quark: str) -> ClsMtd:
        m = ClsMtd(self._next_id, confidence, class_quark)
        self._next_id += 1
        self.cls.append(m)
        return m

    def set_relation(self, rel: RelTypes, from_id: int, to_id: int) -> None:
        self.relations.append((rel, from_id, to_id))

    def __repr__(self):
        return f"AnalyticsRelationMeta(od={len(self.od)}, cls={len(self.cls)})"


__all__ = [
    "AnalyticsRelationMeta",
    "ClsMtd",
    "OdMtd",
    "RelTypes",
    "Tensor",
    "TensorDataType",
    "TensorDimOrder",
    "TensorMeta",
]
