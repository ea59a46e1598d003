"""Plumbing: tee, audioconvert, videoconvert.

These mirror the GStreamer core elements every reference pipeline leans on
(e.g. `audioconvert` in ebur128level tests, `videoconvertscale` in the
yoloxinference example).  audioconvert handles sample-format conversion
(F64/F32/S32/S16) on device; videoconvert repacks between the RGB-family
layouts (channel reorder / alpha add-drop).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
    Element,
    Event,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    TransformMode,
    ValueList,
    VideoFilter,
    audio_caps_template,
    register,
    video_caps_template,
)
from ...core.video import RGB_FORMATS


@register
class Tee(Element):
    ELEMENT_NAME = "tee"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "1-to-N stream duplication"

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK, PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._counter = 0

    def request_src_pad(self) -> Pad:
        pad = Pad(
            f"src_{self._counter}",
            PadDirection.SRC,
            PadTemplate("src_%u", PadDirection.SRC, PadPresence.REQUEST, Caps.new_any()),
        )
        self._counter += 1
        return self.add_pad(pad)

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        ret = FlowReturn.OK
        for src in self.src_pads():
            if src.peer is not None:
                r = src.push(buf)
                if r != FlowReturn.OK:
                    ret = r
        return ret

    def _event(self, pad: Pad, event: Event) -> bool:
        ok = True
        for src in self.src_pads():
            ok = src.push_event(event) and ok
        return ok


_A_FORMATS = ("F64", "F32", "S32", "S16")
_SCALES = {"S16": 32768.0, "S32": 2147483648.0}


_LAYOUTS = ("interleaved", "non-interleaved")


@register
class AudioConvert(BaseTransform):
    """Converts sample formats AND layouts.  Non-interleaved (planar)
    payloads are [channels, frames]; interleaved are [frames, channels]."""

    ELEMENT_NAME = "audioconvert"
    ELEMENT_CLASS = "Filter/Converter/Audio"
    ELEMENT_DESCRIPTION = "Converts audio sample formats and layouts"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = audio_caps_template(formats=_A_FORMATS, layouts=_LAYOUTS)
    SRC_CAPS = audio_caps_template(formats=_A_FORMATS, layouts=_LAYOUTS)

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            s["format"] = ValueList(_A_FORMATS)
            s["layout"] = ValueList(_LAYOUTS)
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        # prefer keeping the input format and layout
        s = caps.structure(0)
        return othercaps.fixate({"format": s.get("format"), "layout": s.get("layout")})

    def transform(self, inbuf: Buffer) -> Buffer:
        in_fmt = self.in_caps.structure(0)["format"]
        out_fmt = self.out_caps.structure(0)["format"]
        in_layout = self.in_caps.structure(0).get("layout", "interleaved")
        out_layout = self.out_caps.structure(0).get("layout", "interleaved")
        x = inbuf.data
        if in_layout != out_layout:
            x = x.T
        if in_fmt != out_fmt:
            # normalize to float
            if in_fmt in _SCALES:
                x = x.astype(jnp.float32) / _SCALES[in_fmt]
            elif in_fmt == "F64":
                x = x.astype(jnp.float32) if out_fmt != "F64" else x
            if out_fmt in _SCALES:
                s = _SCALES[out_fmt]
                x = jnp.clip(x, -1.0, 1.0 - 1.0 / s) * s
                x = x.astype(jnp.int16 if out_fmt == "S16" else jnp.int32)
            elif out_fmt == "F64":
                import jax

                x = x.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
            else:
                x = x.astype(jnp.float32)
        out = Buffer(x)
        out.copy_metadata_from(inbuf)
        return out


@register
class VideoConvert(VideoFilter):
    ELEMENT_NAME = "videoconvert"
    ELEMENT_CLASS = "Filter/Converter/Video"
    ELEMENT_DESCRIPTION = "Converts between packed RGB-family video formats"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = video_caps_template(tuple(RGB_FORMATS))
    SRC_CAPS = video_caps_template(tuple(RGB_FORMATS))

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            s["format"] = ValueList(tuple(RGB_FORMATS))
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        in_fmt = caps.structure(0).get("format")
        return othercaps.fixate({"format": in_fmt})

    def transform(self, inbuf: Buffer) -> Buffer:
        in_info, out_info = self.video_info, self.out_video_info
        assert in_info is not None and out_info is not None
        if in_info.format == out_info.format:
            out = Buffer(inbuf.data)
            out.copy_metadata_from(inbuf)
            return out
        ir, ig, ib, ia = in_info.rgb_offsets
        our, oug, oub, oa = out_info.rgb_offsets
        maxv_in = 255 if in_info.dtype == np.uint8 else 65535
        maxv_out = 255 if out_info.dtype == np.uint8 else 65535
        frame = inbuf.data

        def comp(off):
            c = frame[..., off]
            if maxv_in != maxv_out:
                c = (c.astype(jnp.uint32) * maxv_out // maxv_in)
            return c

        h, w = frame.shape[0], frame.shape[1]
        dtype = jnp.uint8 if out_info.dtype == np.uint8 else jnp.uint16
        out_frame = jnp.zeros((h, w, out_info.components), dtype)
        out_frame = out_frame.at[..., our].set(comp(ir).astype(dtype))
        out_frame = out_frame.at[..., oug].set(comp(ig).astype(dtype))
        out_frame = out_frame.at[..., oub].set(comp(ib).astype(dtype))
        if oa is not None:
            if ia is not None:
                out_frame = out_frame.at[..., oa].set(comp(ia).astype(dtype))
            else:
                out_frame = out_frame.at[..., oa].set(jnp.asarray(maxv_out, dtype))
        out = Buffer(out_frame)
        out.copy_metadata_from(inbuf)
        return out


__all__ = ["Tee", "AudioConvert", "VideoConvert"]
