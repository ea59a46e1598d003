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


_VC_FORMATS = tuple(RGB_FORMATS) + ("I420", "NV12")


@register
class AudioResample(BaseTransform):
    """Rational sample-rate conversion (ops/resample.py: the polyphase
    resampler as ONE dilated XLA conv on the MXU).  Bridges the
    fixed-rate compute elements — audiornnoise is 48 kHz-only while
    audioloudnorm is 192 kHz-only (the reference inherits this pairing
    problem and solves it with GStreamer-core audioresample; see
    audio/audiofx/src/audioloudnorm/imp.rs:207-214).

    F32 interleaved; output PTS runs on the output-sample counter
    anchored at the first input PTS (gap-free timeline)."""

    ELEMENT_NAME = "audioresample"
    ELEMENT_CLASS = "Filter/Converter/Audio"
    ELEMENT_DESCRIPTION = "Resamples audio (polyphase Kaiser-sinc on MXU)"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = audio_caps_template(formats=("F32",))
    SRC_CAPS = audio_caps_template(formats=("F32",))

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._rs = None
        self._out_rate = 0
        self._base_pts = None
        self._out_samples = 0

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        from ...core import IntRange

        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            s["rate"] = IntRange(1, 2_822_400)
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        s = caps.structure(0)
        return othercaps.fixate({"rate": s.get("rate")})

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        from ...ops.resample import Resampler

        in_rate = incaps.structure(0)["rate"]
        self._out_rate = outcaps.structure(0)["rate"]
        self._rs = Resampler(in_rate, self._out_rate)
        self._base_pts = None
        self._out_samples = 0

    def _emit(self, y, inbuf: Buffer) -> Buffer:
        pts = None
        if self._base_pts is not None:
            pts = self._base_pts + self._out_samples * 1_000_000_000 // self._out_rate
        out = Buffer(y, pts=pts,
                     duration=y.shape[0] * 1_000_000_000 // self._out_rate)
        self._out_samples += int(y.shape[0])
        return out

    def transform(self, inbuf: Buffer) -> Optional[Buffer]:
        if self._base_pts is None:
            self._base_pts = inbuf.pts if inbuf.pts is not None else 0
        y = self._rs.process(jnp.atleast_2d(inbuf.data))
        if y.shape[0] == 0:
            return None  # polyphase warm-up: nothing to push yet
        return self._emit(y, inbuf)

    def drain(self) -> Optional[Buffer]:
        if self._rs is None or self._rs.identity or self._base_pts is None:
            return None
        y = self._rs.drain()
        return self._emit(y, None) if y.shape[0] else None

    def on_paused_to_ready(self) -> None:
        super().on_paused_to_ready()
        if self._rs is not None:
            self._rs.reset()
        self._base_pts = None
        self._out_samples = 0


@register
class VideoConvert(VideoFilter):
    """Packed RGB-family repacks AND BT.601 4:2:0 colorspace conversion
    (I420/NV12 <-> any RGB format, ops/yuv.py device kernels) — the bridge
    between the RGB-domain compute elements and the I420-domain codecs.
    4:2:0 formats need even width/height (same constraint as the codecs)."""

    ELEMENT_NAME = "videoconvert"
    ELEMENT_CLASS = "Filter/Converter/Video"
    ELEMENT_DESCRIPTION = "Converts video formats (RGB family, I420/NV12 4:2:0)"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = video_caps_template(_VC_FORMATS)
    SRC_CAPS = video_caps_template(_VC_FORMATS)

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            s["format"] = ValueList(_VC_FORMATS)
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        in_fmt = caps.structure(0).get("format")
        return othercaps.fixate({"format": in_fmt})

    def __init__(self, name=None):
        super().__init__(name)
        self._converters = {}  # (in_fmt, out_fmt) -> jitted payload->payload

    def _build_converter(self, in_info, out_info):
        import jax

        return jax.jit(build_format_converter(in_info, out_info))

    def pure_kernel(self):
        """Chain-fusion hook (parallel/fuse.py): the raw converter closed
        over the negotiated formats."""
        in_info, out_info = self.video_info, self.out_video_info
        if in_info is None or out_info is None or in_info.format == out_info.format:
            return lambda d: d
        return build_format_converter(in_info, out_info)


    def transform(self, inbuf: Buffer) -> Buffer:
        in_info, out_info = self.video_info, self.out_video_info
        assert in_info is not None and out_info is not None
        if in_info.format == out_info.format:
            out = Buffer(inbuf.data)
            out.copy_metadata_from(inbuf)
            return out
        if (in_info.is_planar or out_info.is_planar) and (
                in_info.width % 2 or in_info.height % 2):
            raise ValueError(
                f"{self.name}: 4:2:0 conversion needs even dimensions, got "
                f"{in_info.width}x{in_info.height}")
        key = (in_info.format, out_info.format)
        fn = self._converters.get(key)
        if fn is None:
            fn = self._converters[key] = self._build_converter(in_info, out_info)
        data = inbuf.data
        if in_info.is_planar:
            data = tuple(jnp.asarray(p) for p in data)
        payload = fn(data)
        out = Buffer(payload if not isinstance(payload, (tuple, list))
                     else tuple(payload))
        out.copy_metadata_from(inbuf)
        return out



def build_format_converter(in_info, out_info):
    """Raw (unjitted) payload->payload converter for a format pair.

    Dimension-agnostic: geometry comes from the arrays, so callers can jit
    it alone (videoconvert) or fuse it with scaling (videoconvertscale).
    """
    from ...ops.yuv import (
        i420_to_rgb_planes,
        nv12_to_uv,
        rgb_planes_to_i420,
        uv_to_nv12,
    )

    in_planar, out_planar = in_info.is_planar, out_info.is_planar
    in_fmt, out_fmt = in_info.format, out_info.format

    def to_planes(frame):
        """Any input payload -> (y, u, v) u8 planes."""
        if in_fmt == "I420":
            return frame
        if in_fmt == "NV12":
            y, uv = frame
            u, v = nv12_to_uv(uv)
            return y, u, v
        ir, ig, ib, _ = in_info.rgb_offsets
        scale = (1.0 / 257.0) if in_info.dtype != np.uint8 else 1.0
        return rgb_planes_to_i420(
            frame[..., ir].astype(jnp.float32) * scale,
            frame[..., ig].astype(jnp.float32) * scale,
            frame[..., ib].astype(jnp.float32) * scale,
        )

    if out_planar:  # RGB/I420/NV12 -> I420/NV12

        def convert(frame):
            y, u, v = to_planes(frame)
            return (y, uv_to_nv12(u, v)) if out_fmt == "NV12" else (y, u, v)

        return convert

    our, oug, oub, oa = out_info.rgb_offsets
    maxv_out = 255 if out_info.dtype == np.uint8 else 65535
    dtype = jnp.uint8 if out_info.dtype == np.uint8 else jnp.uint16

    if in_planar:  # I420/NV12 -> packed

        def convert(frame):
            y, u, v = to_planes(frame)
            if out_fmt == "GRAY8":
                # GRAY8 is full-range luma; rescale studio-swing Y directly
                g8 = jnp.clip(jnp.round(
                    (y.astype(jnp.float32) - 16.0) * (255.0 / 219.0)),
                    0.0, 255.0).astype(jnp.uint8)
                return g8[..., None]
            r, g, b = i420_to_rgb_planes(y, u, v)

            def comp_from(plane):
                if maxv_out == 65535:
                    return (plane.astype(jnp.uint32) * 257).astype(dtype)
                return plane.astype(dtype)

            h, w = y.shape
            out_frame = jnp.zeros((h, w, out_info.components), dtype)
            out_frame = out_frame.at[..., our].set(comp_from(r))
            out_frame = out_frame.at[..., oug].set(comp_from(g))
            out_frame = out_frame.at[..., oub].set(comp_from(b))
            if oa is not None:
                out_frame = out_frame.at[..., oa].set(jnp.asarray(maxv_out, dtype))
            return out_frame

        return convert

    # packed -> packed (channel reorder / alpha add-drop / depth rescale)
    ir, ig, ib, ia = in_info.rgb_offsets
    maxv_in = 255 if in_info.dtype == np.uint8 else 65535

    if out_fmt == "GRAY8":
        # GRAY8 is full-range BT.601 luma, not a channel copy (offsets
        # (0,0,0) would otherwise make the three writes last-write-win)
        from ...ops.yuv import KB, KG, KR

        def convert(frame):
            scale = (1.0 / 257.0) if maxv_in == 65535 else 1.0
            r = frame[..., ir].astype(jnp.float32) * scale
            g = frame[..., ig].astype(jnp.float32) * scale
            b = frame[..., ib].astype(jnp.float32) * scale
            y = jnp.clip(jnp.round(KR * r + KG * g + KB * b), 0.0, 255.0)
            return y.astype(jnp.uint8)[..., None]

        return convert

    def convert(frame):
        def comp(off):
            c = frame[..., off]
            if maxv_in != maxv_out:
                c = (c.astype(jnp.uint32) * maxv_out // maxv_in)
            return c

        h, w = frame.shape[0], frame.shape[1]
        out_frame = jnp.zeros((h, w, out_info.components), dtype)
        out_frame = out_frame.at[..., our].set(comp(ir).astype(dtype))
        out_frame = out_frame.at[..., oug].set(comp(ig).astype(dtype))
        out_frame = out_frame.at[..., oub].set(comp(ib).astype(dtype))
        if oa is not None:
            if ia is not None:
                out_frame = out_frame.at[..., oa].set(comp(ia).astype(dtype))
            else:
                out_frame = out_frame.at[..., oa].set(jnp.asarray(maxv_out, dtype))
        return out_frame

    return convert


__all__ = ["Tee", "AudioConvert", "AudioResample", "VideoConvert",
           "build_format_converter"]
