"""yoloxinference: YOLOX object detection attaching tensors to video buffers.

Parity target: analytics/burn/src/yoloxinference/imp.rs (677 LoC): in-place
video element, caps RGB with width/height multiples of 32 (imp.rs:237-253);
attaches a `yolox-out` tensor/strided TensorMeta dims [1, N, 5+classes] f32
row-major (imp.rs:415-472).  Model zoo nano..x via width/depth multipliers;
`weights-path` loads a PyTorch state_dict with the reference's key remapping.
Registered as both `yoloxinference` and the reference's `burn-yoloxinference`.

TPU-native: the forward pass is a jitted flax apply on device; the output
tensor stays device-resident in the meta (consumers map it on demand).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core import (
    Buffer,
    Caps,
    IntRange,
    Prop,
    TransformMode,
    VideoFilter,
    register,
    video_caps_template,
)
from ...models.yolox import Yolox, load_torch_weights
from ...models.yolox_fast import apply_fast
from .meta import Tensor, TensorDataType, TensorDimOrder, TensorMeta

YOLOX_OUT = "yolox-out"


def _caps_32() -> Caps:
    caps = video_caps_template(("RGB",))
    s = caps.structure(0)
    s["width"] = IntRange(32, 2**31 - 32)
    s["height"] = IntRange(32, 2**31 - 32)
    return caps


class YoloxInference(VideoFilter):
    ELEMENT_NAME = "yoloxinference"
    ELEMENT_CLASS = "Filter/Analyzer/Video"
    ELEMENT_DESCRIPTION = "YOLOX object detection inference, attaches tensor meta"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = _caps_32()
    SRC_CAPS = _caps_32()

    PROPERTIES = [
        Prop("model-type", "tiny", type="enum", choices=["nano", "tiny", "s", "m", "l", "x"],
             mutable="ready"),
        Prop("num-classes", 80, type="uint", minimum=1, mutable="ready"),
        Prop("weights-path", None, type="str", mutable="ready",
             doc="PyTorch .pth checkpoint (official YOLOX state_dict)"),
        Prop("backend-type", "tpu", type="str", mutable="ready",
             doc="Accepted for API parity; inference always runs on the JAX device"),
        Prop("precision", "f32", type="enum", choices=["f32", "bf16"],
             mutable="ready",
             doc="bf16 compute halves activation traffic in the "
                 "small-channel backbone stages (PERF_NOTES.md round-3 "
                 "YOLOX s2d engine measurements)"),
        Prop("engine", "fast", type="enum", choices=["fast", "reference"],
             mutable="ready",
             doc="fast = s2d-domain inference engine (models/yolox_fast.py, "
                 "numerically equivalent, measured ~2x on v5e); reference = "
                 "the reference-shaped flax graph (models/yolox.py)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._model: Optional[Yolox] = None
        self._vars = None
        self._apply = None

    def start(self) -> None:
        variant = self.get_property("model-type")
        ncls = self.get_property("num-classes")
        self._model = Yolox.from_variant(variant, ncls)
        self._vars = None  # lazily initialized at first frame (needs H, W)

    def stop(self) -> None:
        self._model = None
        self._vars = None
        self._apply = None

    def _ensure_vars(self, h: int, w: int) -> None:
        if self._vars is not None:
            return
        model = self._model
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        self._vars = model.init(jax.random.PRNGKey(0), x)
        path = self.get_property("weights-path")
        if path:
            self._vars = load_torch_weights(path, self._vars)
        dtype = (jnp.bfloat16 if self.get_property("precision") == "bf16"
                 else jnp.float32)
        if self.get_property("engine") == "fast":
            # weights stay f32 in the tree; apply_fast folds BN and casts
            # per-conv at trace time (constant-folded by XLA)
            self._apply = jax.jit(
                lambda v, img: apply_fast(model, v, img, dtype=dtype))
        elif dtype == jnp.bfloat16:
            self._vars = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                self._vars,
            )
            self._apply = jax.jit(
                lambda v, img: model.apply(v, img.astype(jnp.bfloat16)).astype(jnp.float32)
            )
        else:
            self._apply = jax.jit(lambda v, img: model.apply(v, img))

    def transform_ip(self, buf: Buffer) -> Buffer:
        info = self.video_info
        assert info is not None
        h, w = info.height, info.width
        self._ensure_vars(h, w)
        # keep the frame u8 — the model casts in-jit (6.5x faster stem: the
        # f32 [H,W,3] layout lane-pads 3->128; PERF_NOTES round-3 YOLOX)
        img = jnp.asarray(buf.data)[None]  # [1, H, W, 3] u8, 0..255 raw
        out = self._apply(self._vars, img)  # [1, N, 5+classes]
        n, cols = int(out.shape[1]), int(out.shape[2])
        meta = TensorMeta(
            [
                Tensor(
                    YOLOX_OUT,
                    TensorDataType.FLOAT32,
                    (1, n, cols),
                    TensorDimOrder.ROW_MAJOR,
                    out,
                )
            ]
        )
        buf.add_meta(meta)
        return buf


# reference-compatible factory name
@register
class BurnYoloxInference(YoloxInference):
    ELEMENT_NAME = "burn-yoloxinference"


register(YoloxInference)

__all__ = ["YoloxInference", "BurnYoloxInference", "YOLOX_OUT"]
