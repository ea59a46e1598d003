"""sofalizer: binaural renderer driven by SOFA (AES69) HRTF files.

Parity target: audio/hrtf/src/sofa/imp.rs (888 LoC): same element shape as
hrtfrender (N channels -> stereo, block = block-length samples) but HRIRs
come from a SOFA file and rendering uses uniformly partitioned convolution
(partition-length, default 64); per-channel processors are Render or Drop
(LFE channels are dropped, imp.rs:76-101); filters are re-selected from the
SOFA sphere only when an object moves more than `update-threshold`
(imp.rs:129-157).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ...core import (
    Adapter,
    AudioInfo,
    BaseTransform,
    Buffer,
    Caps,
    ChannelPosition,
    Event,
    EventType,
    FlowError,
    FlowReturn,
    IntRange,
    PadDirection,
    Prop,
    SECOND,
    TransformMode,
    audio_caps_template,
    register,
)
from ...ops.sofa import SofaFile, partition_filter, upols_block
from .hrtfrender import SpatialObject


def to_system(coord_system: str, obj: SpatialObject):
    """Convert an object's position into the configured SOFA coordinate
    system (spatial.rs conversions)."""
    x, y, z = obj.x, obj.y, obj.z
    src = obj.coordinate_system
    # first to cartesian
    if src == "left-handed":
        cx, cy, cz = z, -x, y
    elif src == "right-handed":
        cx, cy, cz = -z, -x, y
    else:
        cx, cy, cz = x, y, z
    if coord_system == "cartesian":
        return (cx, cy, cz)
    if coord_system == "left-handed":
        return (-cy, cz, cx)
    return (-cy, cz, -cx)


@register
class Sofalizer(BaseTransform):
    ELEMENT_NAME = "sofalizer"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Renders spatial sounds with a SOFA file"
    MODE = TransformMode.NEVER_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False

    SINK_CAPS = audio_caps_template(formats=("F32",))
    SRC_CAPS = audio_caps_template(formats=("F32",), channels=2)

    PROPERTIES = [
        Prop("sofa", None, type="str", mutable="ready", doc="SOFA file location"),
        Prop("sofa-coordinate-system", "cartesian", type="enum",
             choices=["cartesian", "left-handed", "right-handed"], mutable="ready"),
        Prop("partition-length", 64, type="uint64", mutable="ready"),
        Prop("block-length", 256, type="uint64", mutable="ready"),
        Prop("neighbor-angle-step", 0.5, mutable="ready"),
        Prop("neighbor-radius-step", 0.5, mutable="ready"),
        Prop("update-threshold", 0.01, mutable="playing",
             doc="Re-select HRIR when an object moves farther than this"),
        Prop("use-rayon", False, type="bool", mutable="ready",
             doc="Accepted for API parity; channels are batched on device"),
        Prop("spatial-objects", None, type="object", mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._adapter = Adapter()
        self._sofa: Optional[SofaFile] = None
        self._in_info: Optional[AudioInfo] = None
        self._H = None  # [C, P, 2, L+1] partition spectra (zeros for Drop)
        self._fdl = None  # [C, P, L+1]
        self._prev = None  # [C, L]
        self._objs: Optional[List[SpatialObject]] = None
        self._applied: Optional[List[Optional[tuple]]] = None
        self._drop: List[bool] = []

    # -- negotiation (same caps rewrite as hrtfrender) -------------------------
    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            s["format"] = "F32"
            s["layout"] = "interleaved"
            if direction == PadDirection.SINK:
                s["channels"] = 2
            else:
                objs = self.get_property("spatial-objects")
                s["channels"] = len(objs) if objs else IntRange(1, 64)
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        self._in_info = AudioInfo.from_caps(incaps)
        path = self.get_property("sofa")
        if path is None:
            raise FlowError(FlowReturn.NOT_NEGOTIATED, "No SOFA file set")
        self._sofa = SofaFile.from_file(path)

        objs = self.get_property("spatial-objects")
        if objs is None:
            objs = [SpatialObject.from_channel_position(p) for p in self._in_info.positions]
        else:
            objs = [SpatialObject.from_any(o) for o in objs]
        if len(objs) != self._in_info.channels:
            raise FlowError(FlowReturn.NOT_NEGOTIATED, "Wrong number of spatial objects")
        self._props["spatial-objects"] = objs
        self._objs = objs
        # LFE channels are dropped (imp.rs:76-101)
        self._drop = [p == ChannelPosition.LFE1 for p in self._in_info.positions]

        L = self.get_property("partition-length")
        n_taps = self._sofa.ir.shape[-1]
        P = max(1, -(-n_taps // L))
        C = self._in_info.channels
        self._H = (jnp.zeros((C, P, 2, L + 1), jnp.float32), jnp.zeros((C, P, 2, L + 1), jnp.float32))
        self._fdl = (jnp.zeros((C, P, L + 1), jnp.float32), jnp.zeros((C, P, L + 1), jnp.float32))
        self._prev = jnp.zeros((C, L), jnp.float32)
        self._applied = [None] * C
        self._update_filters(force=True)
        self._adapter.clear()

    def _update_filters(self, force: bool = False) -> None:
        objs = self.get_property("spatial-objects")
        thr = self.get_property("update-threshold")
        system = self.get_property("sofa-coordinate-system")
        L = self.get_property("partition-length")
        for c, obj in enumerate(objs):
            if self._drop[c]:
                continue
            obj = SpatialObject.from_any(obj)
            pos = to_system(system, obj)
            prev = self._applied[c]
            if not force and prev is not None:
                d = sum((a - b) ** 2 for a, b in zip(pos, prev)) ** 0.5
                if d <= thr:
                    continue
            idx = self._sofa.nearest(pos)
            Hr, Hi = partition_filter(self._sofa.hrir(idx), L)  # [P, 2, L+1]
            self._H = (
                self._H[0].at[c].set(jnp.asarray(Hr)),
                self._H[1].at[c].set(jnp.asarray(Hi)),
            )
            self._applied[c] = pos

    def property_changed(self, name, value) -> None:
        if name == "spatial-objects" and value is not None and self._sofa is not None:
            self._props[name] = [SpatialObject.from_any(o) for o in value]
            self._update_filters()

    # -- processing ----------------------------------------------------------------
    def _block_samples(self) -> int:
        return self.get_property("block-length")

    def _process(self, data):
        """data: [n*block, C] -> [n*block, 2]"""
        import jax

        L = self.get_property("partition-length")
        n = data.shape[0]
        gains = jnp.asarray(
            [0.0 if self._drop[c] else SpatialObject.from_any(o).distance_gain
             for c, o in enumerate(self.get_property("spatial-objects"))],
            jnp.float32,
        )
        x = jnp.asarray(data, jnp.float32) * gains[None, :]
        outs = []
        step = jax.vmap(upols_block)  # over channels
        fdl_re, fdl_im = self._fdl
        Hr, Hi = self._H
        for i in range(0, n, L):
            blk = x[i : i + L].T  # [C, L]
            fdl_re, fdl_im, self._prev, y = step(fdl_re, fdl_im, self._prev, blk, Hr, Hi)
            outs.append(jnp.sum(y, axis=0))  # mix channels -> [L, 2]
        self._fdl = (fdl_re, fdl_im)
        return jnp.concatenate(outs, axis=0)

    def submit_input_buffer(self, buf: Buffer) -> None:
        self._adapter.push(buf)

    def generate_output(self) -> Optional[Buffer]:
        info = self._in_info
        blk = self._block_samples()
        if info is None or self._adapter.available() < blk:
            return None
        pts, dist = self._adapter.prev_pts()
        off, _ = self._adapter.prev_offset()
        n = (self._adapter.available() // blk) * blk
        data = self._adapter.take(n)
        out = self._process(data)
        out_pts = None if pts is None else pts + dist * SECOND // info.rate
        out_off = None if off is None else off + dist
        return Buffer(out, pts=out_pts, offset=out_off, duration=n * SECOND // info.rate)

    def drain(self) -> Optional[Buffer]:
        info = self._in_info
        avail = self._adapter.available()
        if info is None or avail == 0:
            return None
        pts, dist = self._adapter.prev_pts()
        off, _ = self._adapter.prev_offset()
        blk = self._block_samples()
        pad = (-avail) % blk
        data = np.zeros((avail + pad, info.channels), np.float32)
        data[:avail] = np.asarray(self._adapter.take(avail))
        out = self._process(data)[:avail]
        if self._fdl is not None:
            self._fdl = tuple(jnp.zeros_like(a) for a in self._fdl)
            self._prev = jnp.zeros_like(self._prev)
        out_pts = None if pts is None else pts + dist * SECOND // info.rate
        out_off = None if off is None else off + dist
        return Buffer(out, pts=out_pts, offset=out_off, duration=avail * SECOND // info.rate)

    def sink_event(self, event: Event) -> bool:
        if event.type == EventType.FLUSH_STOP:
            self._adapter.clear()
            if self._fdl is not None:
                self._fdl = tuple(jnp.zeros_like(a) for a in self._fdl)
                self._prev = jnp.zeros_like(self._prev)
        return True

    def stop(self) -> None:
        self._adapter.clear()
        self._sofa = None
        self._in_info = None
        self._H = None
        self._fdl = None
        self._prev = None


__all__ = ["Sofalizer"]
