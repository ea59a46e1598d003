"""hrtfrender: binaural HRTF renderer (N channels -> stereo).

Parity target: audio/hrtf/src/hrtf/imp.rs (760 LoC) + spatial.rs: block =
interpolation-steps x block-length samples; caps sink F32 interleaved 1-64 ch,
src F32 stereo; transform_caps forces the opposite side (imp.rs:602-646);
spatial objects per channel ({position, distance-gain}, Cartesian/LeftHanded/
RightHanded coords) defaulting from channel positions (spatial.rs:177-221);
EOS drain pads the final partial block with zeros and preserves
PTS/offset/duration (imp.rs:280-349); flush-stop clears the adapter.
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
from ...ops.hrtf import HrirSphere, hrtf_convolve_block, hrtf_convolve_blocks

# Default speaker-position coordinates, left-handed (spatial.rs:183-212)
_POSITION_COORDS = {
    ChannelPosition.FRONT_LEFT: (-1.45, 0.0, 2.5),
    ChannelPosition.FRONT_RIGHT: (1.45, 0.0, 2.5),
    ChannelPosition.FRONT_CENTER: (0.0, 0.0, 2.5),
    ChannelPosition.MONO: (0.0, 0.0, 2.5),
    ChannelPosition.LFE1: (0.0, 0.0, 0.0),
    ChannelPosition.REAR_LEFT: (-1.45, 0.0, -2.5),
    ChannelPosition.REAR_RIGHT: (1.45, 0.0, -2.5),
    ChannelPosition.REAR_CENTER: (0.0, 0.0, -2.5),
    ChannelPosition.SIDE_LEFT: (-2.5, 0.0, -0.44),
    ChannelPosition.SIDE_RIGHT: (2.5, 0.0, -0.44),
}


def to_right_handed(coord_system: str, v):
    """Convert a position to right-handed coords (spatial.rs:63-71), the
    system the HRIR sphere mesh lives in."""
    x, y, z = v
    if coord_system == "cartesian":
        return (-y, z, -x)
    if coord_system == "left-handed":
        return (x, y, -z)
    return (x, y, z)


class SpatialObject:
    def __init__(self, x=1000.0, y=1000.0, z=1000.0, distance_gain=1.0, coordinate_system="left-handed"):
        self.x, self.y, self.z = float(x), float(y), float(z)
        self.distance_gain = float(distance_gain)
        self.coordinate_system = coordinate_system

    def direction(self):
        return to_right_handed(self.coordinate_system, (self.x, self.y, self.z))

    @staticmethod
    def from_any(obj) -> "SpatialObject":
        if isinstance(obj, SpatialObject):
            return obj
        if isinstance(obj, dict):
            return SpatialObject(
                obj.get("x", 0.0),
                obj.get("y", 0.0),
                obj.get("z", 0.0),
                obj.get("distance-gain", obj.get("distance_gain", 1.0)),
                obj.get("coordinate-system", obj.get("coordinate_system", "left-handed")),
            )
        raise TypeError(f"cannot convert {obj!r} to SpatialObject")

    @staticmethod
    def from_channel_position(pos: ChannelPosition) -> "SpatialObject":
        if pos not in _POSITION_COORDS:
            raise FlowError(FlowReturn.ERROR, f"Unsupported channel position {pos}")
        x, y, z = _POSITION_COORDS[pos]
        return SpatialObject(x, y, z, 1.0, "left-handed")


@register
class HrtfRender(BaseTransform):
    ELEMENT_NAME = "hrtfrender"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Renders spatial sounds to a given position"
    MODE = TransformMode.NEVER_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False

    SINK_CAPS = audio_caps_template(formats=("F32",))
    SRC_CAPS = audio_caps_template(formats=("F32",), channels=2)

    PROPERTIES = [
        Prop("hrir-raw", None, type="bytes", mutable="ready"),
        Prop("hrir-file", None, type="str", mutable="ready"),
        Prop("interpolation-steps", 8, type="uint64", mutable="ready"),
        Prop("block-length", 512, type="uint64", mutable="ready"),
        Prop("use-rayon", False, type="bool", mutable="ready",
             doc="Accepted for API parity; channels are always batched on device"),
        Prop("spatial-objects", None, type="object", mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._adapter = Adapter()
        self._sphere: Optional[HrirSphere] = None
        self._in_info: Optional[AudioInfo] = None
        self._tails = None
        self._prev_obj: Optional[List[SpatialObject]] = None
        self._block_samples = 0

    # -- negotiation ---------------------------------------------------------
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
        objs = self.get_property("spatial-objects")
        if objs is None:
            objs = [SpatialObject.from_channel_position(p) for p in self._in_info.positions]
            self._props["spatial-objects"] = objs
        else:
            objs = [SpatialObject.from_any(o) for o in objs]
            self._props["spatial-objects"] = objs
        if len(objs) != self._in_info.channels:
            raise FlowError(FlowReturn.NOT_NEGOTIATED, "Wrong number of spatial objects")

        raw = self.get_property("hrir-raw")
        path = self.get_property("hrir-file")
        if raw is not None:
            self._sphere = HrirSphere.parse(bytes(raw), self._in_info.rate)
        elif path is not None:
            self._sphere = HrirSphere.from_file(path, self._in_info.rate)
        else:
            raise FlowError(FlowReturn.NOT_NEGOTIATED, "Impulse response not set")

        steps = self.get_property("interpolation-steps")
        blk = self.get_property("block-length")
        self._block_samples = steps * blk
        C = self._in_info.channels
        L = self._sphere.length
        self._tails = jnp.zeros((C, 2, max(L - 1, 0)), jnp.float32)
        self._prev_obj = None
        self._adapter.clear()

    def property_changed(self, name, value) -> None:
        if name == "spatial-objects" and value is not None and not isinstance(value[0] if value else None, SpatialObject):
            self._props[name] = [SpatialObject.from_any(o) for o in value]

    # -- processing ------------------------------------------------------------
    def _hrir_tables(self, prev, objs, steps):
        """Per-step interpolated HRIR/gain tables for one block transition
        prev -> objs (imp.rs interpolation-steps contract).  When
        prev == objs every step's table is the steady-state table."""
        C = self._in_info.channels
        L = self._sphere.length
        hrirs = np.zeros((C, steps, 2, L), np.float32)
        gains = np.zeros((C, steps), np.float32)
        for c, (po, no) in enumerate(zip(prev, objs)):
            pv = np.asarray(po.direction(), np.float64)
            nv = np.asarray(no.direction(), np.float64)
            for s in range(steps):
                t = (s + 1) / steps
                vec = pv + (nv - pv) * t
                l, r = self._sphere.sample_bilinear(vec)
                hrirs[c, s, 0] = l
                hrirs[c, s, 1] = r
                gains[c, s] = po.distance_gain + (no.distance_gain - po.distance_gain) * t
        return jnp.asarray(hrirs), jnp.asarray(gains)

    def _process_block(self, block):
        """block: [steps*blk, C] -> [steps*blk, 2]"""
        steps = self.get_property("interpolation-steps")
        blk = self.get_property("block-length")
        objs: List[SpatialObject] = self.get_property("spatial-objects")
        hrirs, gains = self._hrir_tables(self._prev_obj or objs, objs, steps)
        self._prev_obj = list(objs)

        x = block.T  # [C, n]
        out, self._tails = hrtf_convolve_block(
            x, hrirs, gains, self._tails, block_len=blk, steps=steps
        )
        return out

    def _process_blocks(self, blocks):
        """blocks: [K, steps*blk, C] -> [K*steps*blk, 2].  The first block
        interpolates prev->current objects; the remaining K-1 run steady
        state batched through ONE dispatch (hrtf_convolve_blocks scan) —
        bit-equal to K sequential _process_block calls."""
        out0 = self._process_block(blocks[0])
        if blocks.shape[0] == 1:
            return out0
        steps = self.get_property("interpolation-steps")
        blk = self.get_property("block-length")
        objs: List[SpatialObject] = self.get_property("spatial-objects")
        hrirs, gains = self._hrir_tables(objs, objs, steps)
        xs = jnp.moveaxis(blocks[1:], 2, 0)  # [C, K-1, steps*blk]
        outs, self._tails = hrtf_convolve_blocks(
            xs, hrirs, gains, self._tails, block_len=blk, steps=steps
        )
        return jnp.concatenate([out0, outs.reshape(-1, 2)], axis=0)

    def submit_input_buffer(self, buf: Buffer) -> None:
        self._adapter.push(buf)

    def generate_output(self) -> Optional[Buffer]:
        info = self._in_info
        if info is None or self._adapter.available() < self._block_samples:
            return None
        pts, dist = self._adapter.prev_pts()
        off, _ = self._adapter.prev_offset()
        n_blocks = self._adapter.available() // self._block_samples
        n = n_blocks * self._block_samples
        data = self._adapter.take(n)
        out = self._process_blocks(
            jnp.asarray(data).reshape(n_blocks, self._block_samples, -1))
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
        pad = self._block_samples - avail
        data = self._adapter.take(avail)
        block = jnp.concatenate([jnp.asarray(data), jnp.zeros((pad, info.channels), jnp.float32)], axis=0)
        out = self._process_block(block)[:avail]
        if self._tails is not None:
            self._tails = jnp.zeros_like(self._tails)
        out_pts = None if pts is None else pts + dist * SECOND // info.rate
        out_off = None if off is None else off + dist
        return Buffer(out, pts=out_pts, offset=out_off, duration=avail * SECOND // info.rate)

    def sink_event(self, event: Event) -> bool:
        if event.type == EventType.FLUSH_STOP:
            self._adapter.clear()
            if self._tails is not None:
                self._tails = jnp.zeros_like(self._tails)
        return True

    def stop(self) -> None:
        self._adapter.clear()
        self._sphere = None
        self._in_info = None
        self._tails = None
        self._prev_obj = None


__all__ = ["HrtfRender", "SpatialObject"]
