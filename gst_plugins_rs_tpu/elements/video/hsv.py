"""hsvfilter / hsvdetector elements.

Parity targets: video/hsv/src/hsvfilter/imp.rs (377 LoC, in-place HSV
adjust over 10 RGB-family formats) and hsvdetector/imp.rs (708 LoC,
chroma-key detector RGB->RGBA alpha mask, NeverInPlace with caps rewrite).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...core import (
    Buffer,
    Caps,
    PadDirection,
    Prop,
    TransformMode,
    ValueList,
    VideoFilter,
    register,
    video_caps_template,
)
from ...ops.hsv import hsv_detect_frame, hsv_filter_frame

_FILTER_FORMATS = ("RGBx", "xRGB", "BGRx", "xBGR", "RGBA", "ARGB", "BGRA", "ABGR", "RGB", "BGR")
_DETECT_IN_FORMATS = ("RGBx", "xRGB", "BGRx", "xBGR", "RGB", "BGR")
_DETECT_OUT_FORMATS = ("RGBA", "ARGB", "BGRA", "ABGR")


@register
class HsvFilter(VideoFilter):
    ELEMENT_NAME = "hsvfilter"
    ELEMENT_CLASS = "Filter/Effect/Converter/Video"
    ELEMENT_DESCRIPTION = "Works within the HSV colorspace to apply tranformations to incoming frames"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = video_caps_template(_FILTER_FORMATS)
    SRC_CAPS = video_caps_template(_FILTER_FORMATS)
    PROPERTIES = [
        Prop("hue-shift", 0.0, mutable="playing", doc="Hue shifting in degrees"),
        Prop("saturation-mul", 1.0, mutable="playing"),
        Prop("saturation-off", 0.0, mutable="playing"),
        Prop("value-mul", 1.0, mutable="playing"),
        Prop("value-off", 0.0, mutable="playing"),
    ]

    def _params(self):
        return jnp.asarray(
            [
                # pre-reduce mod 360 so the kernel's sextant-unit hue path
                # only needs conditional subtracts (ops/hsv.py)
                self.get_property("hue-shift") % 360.0,
                self.get_property("saturation-mul"),
                self.get_property("saturation-off"),
                self.get_property("value-mul"),
                self.get_property("value-off"),
            ],
            jnp.float32,
        )

    def transform_ip(self, buf: Buffer) -> Buffer:
        info = self.video_info
        assert info is not None
        r, g, b, _a = info.rgb_offsets
        buf.data = hsv_filter_frame(buf.data, self._params(), offsets=(r, g, b))
        return buf

    def pure_kernel(self):
        """Pure device fn over the negotiated caps/current properties, for
        chain fusion (parallel/fuse.py)."""
        info = self.video_info
        assert info is not None, f"{self.name}: pure_kernel before caps"
        r, g, b, _a = info.rgb_offsets
        params = self._params()
        return lambda data: hsv_filter_frame(data, params, offsets=(r, g, b))


@register
class HsvDetector(VideoFilter):
    ELEMENT_NAME = "hsvdetector"
    ELEMENT_CLASS = "Filter/Effect/Converter/Video"
    ELEMENT_DESCRIPTION = "Works within the HSV colorspace to detect if a pixel is within the specified ranges"
    MODE = TransformMode.NEVER_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = video_caps_template(_DETECT_IN_FORMATS)
    SRC_CAPS = video_caps_template(_DETECT_OUT_FORMATS)
    PROPERTIES = [
        Prop("hue-ref", 0.0, mutable="playing", doc="Hue reference in degrees"),
        Prop("hue-var", 10.0, minimum=0.0, maximum=180.0, mutable="playing"),
        Prop("saturation-ref", 0.0, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("saturation-var", 0.15, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("value-ref", 0.0, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("value-var", 0.3, minimum=0.0, maximum=1.0, mutable="playing"),
    ]

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        # swap the format field for the opposite side's format list
        # (hsvdetector/imp.rs:386-411)
        out = caps.copy()
        formats = _DETECT_IN_FORMATS if direction == PadDirection.SRC else _DETECT_OUT_FORMATS
        for s in out.structures:
            s["format"] = ValueList(formats)
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        in_info, out_info = self.video_info, self.out_video_info
        assert in_info is not None and out_info is not None
        ir, ig, ib, _ = in_info.rgb_offsets
        outr, outg, outb, oa = out_info.rgb_offsets
        params = jnp.asarray(
            [
                self.get_property("hue-ref"),
                self.get_property("hue-var"),
                self.get_property("saturation-ref"),
                self.get_property("saturation-var"),
                self.get_property("value-ref"),
                self.get_property("value-var"),
            ],
            jnp.float32,
        )
        out_data = hsv_detect_frame(
            inbuf.data,
            params,
            in_offsets=(ir, ig, ib),
            out_offsets=(outr, outg, outb),
            out_channels=out_info.components,
            alpha_off=oa,
        )
        out = Buffer(out_data)
        out.copy_metadata_from(inbuf)
        return out


__all__ = ["HsvFilter", "HsvDetector"]
