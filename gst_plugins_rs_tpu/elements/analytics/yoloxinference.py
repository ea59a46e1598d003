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


def _caps_32_or_batch() -> Caps:
    """Raw RGB frames, or analyticscombiner batch buffers (every stream's
    frame in a window runs as ONE batched — optionally mesh-sharded —
    forward pass; the TPU-native multi-stream path of SURVEY §2.3)."""
    caps = _caps_32()
    from .combiner import BATCH_CAPS

    return Caps(list(caps.structures) + [s.copy() for s in BATCH_CAPS.structures])


class YoloxInference(VideoFilter):
    ELEMENT_NAME = "yoloxinference"
    ELEMENT_CLASS = "Filter/Analyzer/Video"
    ELEMENT_DESCRIPTION = "YOLOX object detection inference, attaches tensor meta"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = _caps_32_or_batch()
    SRC_CAPS = _caps_32_or_batch()

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
        Prop("engine", "fast", type="enum",
             choices=["fast", "fast-bf16", "reference"],
             mutable="ready",
             doc="fast = s2d-domain inference engine (models/yolox_fast.py, "
                 "numerically equivalent, measured ~2x on v5e); fast-bf16 "
                 "additionally runs the dominant stem+dark2 stage in "
                 "bfloat16 activations (detection-level parity gated in "
                 "tests/test_yolox_fast.py); reference = the "
                 "reference-shaped flax graph (models/yolox.py)"),
        Prop("shard", False, type="bool", mutable="ready",
             doc="shard the batch axis of analytics-batch input over a "
                 "jax.sharding.Mesh of all visible devices (one forward "
                 "pass per combiner window, streams data-parallel over "
                 "the mesh)"),
        Prop("shard-mode", "data", type="enum", choices=["data", "tensor"],
             mutable="ready",
             doc="with shard=true: 'data' = streams/batch data-parallel "
                 "over the mesh; 'tensor' = ONE forward model-parallel — "
                 "every conv's output channels pjit-sharded over the mesh "
                 "(parallel/modelparallel.py; SURVEY §2.3 'shard model "
                 "across TPU mesh with pjit if needed (YOLOX-X)'). Tensor "
                 "mode pays per-layer all-gathers; prefer data mode unless "
                 "single-image latency dominates (PERF_NOTES)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._model: Optional[Yolox] = None
        self._vars = None
        self._apply = None
        self._batch_mode = False
        self._mesh = None

    def start(self) -> None:
        variant = self.get_property("model-type")
        ncls = self.get_property("num-classes")
        self._model = Yolox.from_variant(variant, ncls)
        self._vars = None  # lazily initialized at first frame (needs H, W)
        if self.get_property("shard"):
            import numpy as _np
            from jax.sharding import Mesh

            axis = ("tp" if self.get_property("shard-mode") == "tensor"
                    else "batch")
            self._mesh = Mesh(_np.array(jax.devices()), (axis,))

    def stop(self) -> None:
        self._model = None
        self._vars = None
        self._apply = None
        self._mesh = None

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        # analytics-batch input: per-stream video info comes from each
        # BatchStreamEntry's caps instead of the element caps
        if incaps.structure(0).name == "multistream/x-analytics-batch":
            self._batch_mode = True
            self.video_info = None
            self.out_video_info = None
            return
        self._batch_mode = False
        super().set_caps(incaps, outcaps)

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
        if self._mesh is not None and "tp" in self._mesh.shape:
            # tensor parallelism: conv output channels sharded over the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ...parallel.modelparallel import shard_yolox_variables

            with self._mesh:
                self._vars = shard_yolox_variables(self._vars, self._mesh)
            replicated = NamedSharding(self._mesh, P())
            self._apply = jax.jit(
                lambda v, img: jax.lax.with_sharding_constraint(
                    model.apply(v, img), replicated))
            return
        engine = self.get_property("engine")
        if engine in ("fast", "fast-bf16"):
            # weights stay f32 in the tree; apply_fast folds BN and casts
            # per-conv at trace time (constant-folded by XLA)
            s2d_dtype = jnp.bfloat16 if engine == "fast-bf16" else None
            self._apply = jax.jit(
                lambda v, img: apply_fast(model, v, img, dtype=dtype,
                                          s2d_dtype=s2d_dtype))
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

    def _transform_batch(self, buf: Buffer) -> Buffer:
        """analytics-batch input: ONE forward pass over every frame in the
        window ([N,H,W,3] stacked on device), optionally sharded over the
        mesh (shard=true, streams data-parallel); per-frame [1,boxes,85]
        TensorMeta slices are attached to each inner stream buffer."""
        from .combiner import BatchMeta
        from ...core.video import VideoInfo

        meta = buf.get_meta(BatchMeta)
        if meta is None or not meta.streams:
            return buf
        frames, owners = [], []
        h = w = None
        for entry in meta.streams:
            vi = VideoInfo.from_caps(entry.caps) if entry.caps else None
            for inner in entry.buffers:
                if inner.data is None:
                    continue
                arr = jnp.asarray(inner.data)
                if arr.ndim == 2:  # flat bytes: need caps dims
                    assert vi is not None, "batch stream without video caps"
                    arr = arr.reshape(vi.height, vi.width, 3)
                if h is None:
                    h, w = int(arr.shape[0]), int(arr.shape[1])
                elif (int(arr.shape[0]), int(arr.shape[1])) != (h, w):
                    raise ValueError(
                        "analytics-batch streams must share dimensions for "
                        f"batched inference: {(h, w)} vs {arr.shape[:2]}")
                frames.append(arr)
                owners.append(inner)
        if not frames:
            return buf
        self._ensure_vars(h, w)
        batch = jnp.stack(frames)  # [N, H, W, 3] u8
        n = batch.shape[0]
        if self._mesh is not None and "tp" in self._mesh.shape:
            # tensor mode: batch replicated, weights channel-sharded
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = jax.device_put(batch, NamedSharding(self._mesh, P()))
            with self._mesh:
                out = self._apply(self._vars, batch)
        elif self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = len(self._mesh.devices.ravel())
            pad = (-n) % ndev
            if pad:  # batch must tile the mesh; padded rows are discarded
                batch = jnp.concatenate(
                    [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)])
            batch = jax.device_put(
                batch, NamedSharding(self._mesh, P("batch")))
            with self._mesh:
                out = self._apply(self._vars, batch)
        else:
            out = self._apply(self._vars, batch)
        boxes, cols = int(out.shape[1]), int(out.shape[2])
        for i, inner in enumerate(owners):
            inner.add_meta(TensorMeta([
                Tensor(YOLOX_OUT, TensorDataType.FLOAT32, (1, boxes, cols),
                       TensorDimOrder.ROW_MAJOR, out[i:i + 1])]))
        return buf

    def transform_ip(self, buf: Buffer) -> Buffer:
        if self._batch_mode:
            return self._transform_batch(buf)
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
