"""yoloxtensordec: decodes `yolox-out` TensorMeta into AnalyticsRelationMeta.

Parity target: analytics/analytics/src/yoloxtensordec/imp.rs (484 LoC):
in-place passthrough; finds the tensor meta matching quark/f32/row-major/
[1,*,>=6] (imp.rs:435-462); filters box confidence >= threshold, argmax class
>= threshold, combined = box*class (imp.rs:342-368); sorts by (class, conf
desc); per-class greedy NMS with the reference's +1 pixel IoU convention
(imp.rs:475-484); emits cxcywh->xywh od_mtd + cls_mtd + RELATE_TO relations
with labels from `label-file` or CLASS-n quarks (imp.rs:398-428).

TPU-native split: thresholding/argmax/top-k run on device (one small [K,6]
readback instead of the full [N, 5+classes] tensor); the greedy NMS over the
surviving candidates runs on host.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import BaseTransform, Buffer, Prop, TransformMode, register
from .meta import AnalyticsRelationMeta, RelTypes, TensorDataType, TensorDimOrder, TensorMeta
from .yoloxinference import YOLOX_OUT

MAX_CANDIDATES = 400


@partial(jax.jit, static_argnames=("k",))
def _prefilter(out, box_thr, cls_thr, *, k: int):
    """out: [N, C] -> top-k candidates [k, 6] (cx, cy, w, h, class, combined);
    invalid rows have combined = -1."""
    box_conf = out[:, 4]
    cls_scores = out[:, 5:]
    cls_conf = jnp.max(cls_scores, axis=-1)
    cls_idx = jnp.argmax(cls_scores, axis=-1)
    valid = (box_conf >= box_thr) & (cls_conf >= cls_thr)
    combined = jnp.where(valid, box_conf * cls_conf, -1.0)
    k = min(k, out.shape[0])
    score, idx = jax.lax.top_k(combined, k)
    rows = out[idx]
    return jnp.stack(
        [rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], cls_idx[idx].astype(out.dtype), score],
        axis=1,
    )


def _iou_plus1(b1, b2) -> float:
    a1 = (b1[2] - b1[0] + 1.0) * (b1[3] - b1[1] + 1.0)
    a2 = (b2[2] - b2[0] + 1.0) * (b2[3] - b2[1] + 1.0)
    ix0 = max(b1[0], b2[0])
    ix1 = min(b1[2], b2[2])
    iy0 = max(b1[1], b2[1])
    iy1 = min(b1[3], b2[3])
    inter = max(ix1 - ix0 + 1.0, 0.0) * max(iy1 - iy0 + 1.0, 0.0)
    return inter / (a1 + a2 - inter)


@register
class YoloxTensorDec(BaseTransform):
    ELEMENT_NAME = "yoloxtensordec"
    ELEMENT_CLASS = "Filter/Analyzer/Video"
    ELEMENT_DESCRIPTION = "Decodes YOLOX tensors into object-detection relation metadata"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = True

    PROPERTIES = [
        Prop("box-confidence-threshold", 0.4, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("class-confidence-threshold", 0.4, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("iou-threshold", 0.7, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("max-detections", 100, type="uint", mutable="playing"),
        Prop("label-file", None, type="str", mutable="ready",
             doc="Label file with one label per line"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._labels: List[str] = []

    def start(self) -> None:
        path = self.get_property("label-file")
        self._labels = []
        if path:
            with open(path, "r") as f:
                self._labels = [line.strip() for line in f if line.strip()]

    def _label(self, cls: int) -> str:
        if cls < len(self._labels):
            return self._labels[cls]
        return f"CLASS-{cls}"

    def transform_ip(self, buf: Buffer) -> Buffer:
        meta = None
        for m in buf.iter_meta(TensorMeta):
            for t in m.tensors:
                if (
                    t.id == YOLOX_OUT
                    and t.data_type == TensorDataType.FLOAT32
                    and t.dims_order == TensorDimOrder.ROW_MAJOR
                    and len(t.dims) == 3
                    and t.dims[0] == 1
                    and t.dims[2] >= 6
                ):
                    meta = t
                    break
            if meta:
                break
        if meta is None:
            return buf

        data = meta.data.reshape(meta.dims[1], meta.dims[2])
        cand = np.asarray(
            _prefilter(
                data,
                jnp.float32(self.get_property("box-confidence-threshold")),
                jnp.float32(self.get_property("class-confidence-threshold")),
                k=MAX_CANDIDATES,
            )
        )
        cand = cand[cand[:, 5] > 0.0]
        # xyxy boxes
        boxes = [
            (
                float(cx - w / 2),
                float(cy - h / 2),
                float(cx + w / 2),
                float(cy + h / 2),
                int(cls),
                float(conf),
            )
            for cx, cy, w, h, cls, conf in cand
        ]
        # sort by class then confidence descending (imp.rs:370-375)
        boxes.sort(key=lambda b: (b[4], -b[5]))

        rmeta = AnalyticsRelationMeta()
        max_det = self.get_property("max-detections")
        emitted = 0
        i = 0
        while i < len(boxes):
            j = i
            kept: List[tuple] = []
            while j < len(boxes) and boxes[j][4] == boxes[i][4]:
                b = boxes[j]
                if all(_iou_plus1(kb, b) <= self.get_property("iou-threshold") for kb in kept):
                    kept.append(b)
                j += 1
            for b in kept:
                if emitted >= max_det:
                    break
                x, y = int(b[0]), int(b[1])
                w_, h_ = int(b[2] - b[0]), int(b[3] - b[1])
                label = self._label(b[4])
                od = rmeta.add_od_mtd(label, x, y, w_, h_, b[5])
                cm = rmeta.add_one_cls_mtd(b[5], label)
                rmeta.set_relation(RelTypes.RELATE_TO, od.id, cm.id)
                emitted += 1
            i = j
        buf.add_meta(rmeta)
        return buf


__all__ = ["YoloxTensorDec"]
