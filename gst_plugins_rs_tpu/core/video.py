"""Video format descriptions (VideoInfo analog).

Payload convention: packed RGB-family video buffers carry arrays shaped
[H, W, C] (uint8, or uint16 for 64-bit RGBA formats); planar YUV formats
carry a tuple of planes.  Stride/packing normalization happens once at the
host boundary — on device frames are always densely packed.
"""
from __future__ import annotations

from fractions import Fraction
from typing import Sequence

import numpy as np

from .buffer import SECOND
from .caps import Caps, IntRange, Structure, ValueList

# format -> (components, dtype, (r,g,b,a) channel offsets or None for planar)
RGB_FORMATS = {
    "RGB": (3, np.uint8, (0, 1, 2, None)),
    "BGR": (3, np.uint8, (2, 1, 0, None)),
    "RGBA": (4, np.uint8, (0, 1, 2, 3)),
    "BGRA": (4, np.uint8, (2, 1, 0, 3)),
    "ARGB": (4, np.uint8, (1, 2, 3, 0)),
    "ABGR": (4, np.uint8, (3, 2, 1, 0)),
    "RGBx": (4, np.uint8, (0, 1, 2, None)),
    "BGRx": (4, np.uint8, (2, 1, 0, None)),
    "xRGB": (4, np.uint8, (1, 2, 3, None)),
    "xBGR": (4, np.uint8, (3, 2, 1, None)),
    "RGBA64LE": (4, np.uint16, (0, 1, 2, 3)),
    "RGBA64BE": (4, np.uint16, (0, 1, 2, 3)),
    "GRAY8": (1, np.uint8, (0, 0, 0, None)),
}

# planar YUV formats: list of (h_subsampling, w_subsampling) per plane.
# Payload convention: a tuple of [H/sh, W/sw] uint8 arrays.
PLANAR_FORMATS = {
    "I420": ((1, 1), (2, 2), (2, 2)),
    "A420": ((1, 1), (2, 2), (2, 2), (1, 1)),
    "NV12": ((1, 1), (2, 1)),
}


class VideoInfo:
    def __init__(
        self,
        format: str,
        width: int,
        height: int,
        fps: Fraction = Fraction(30, 1),
    ):
        self.format = format
        self.width = int(width)
        self.height = int(height)
        self.fps = fps

    @property
    def components(self) -> int:
        return RGB_FORMATS[self.format][0]

    @property
    def dtype(self):
        return RGB_FORMATS[self.format][1] if self.format in RGB_FORMATS else np.uint8

    @property
    def is_planar(self) -> bool:
        return self.format in PLANAR_FORMATS

    def plane_dims(self):
        """[(h, w), ...] for planar formats."""
        return [
            (self.height // sh, self.width // sw)
            for (sh, sw) in PLANAR_FORMATS[self.format]
        ]

    @property
    def rgb_offsets(self):
        """(r, g, b, a) channel indices within a packed pixel; a may be None."""
        return RGB_FORMATS[self.format][2]

    @property
    def is_packed_rgb(self) -> bool:
        return self.format in RGB_FORMATS

    def frame_duration(self) -> int:
        return int(SECOND * self.fps.denominator // self.fps.numerator)

    @staticmethod
    def from_caps(caps: Caps) -> "VideoInfo":
        s = caps.structure(0)
        if s.name != "video/x-raw":
            raise ValueError(f"not video caps: {caps!r}")
        fps = s.get("framerate", Fraction(30, 1))
        if not isinstance(fps, Fraction):
            fps = Fraction(fps)
        return VideoInfo(s["format"], s["width"], s["height"], fps)

    def to_caps(self) -> Caps:
        return Caps.builder(
            "video/x-raw",
            format=self.format,
            width=self.width,
            height=self.height,
            framerate=self.fps,
        )

    def __repr__(self):
        return f"VideoInfo({self.format} {self.width}x{self.height}@{self.fps})"

    def __eq__(self, other):
        return (
            isinstance(other, VideoInfo)
            and (self.format, self.width, self.height, self.fps)
            == (other.format, other.width, other.height, other.fps)
        )


def video_caps_template(
    formats: Sequence[str],
    width=None,
    height=None,
) -> Caps:
    fields = {}
    fields["format"] = formats[0] if len(formats) == 1 else ValueList(formats)
    fields["width"] = width if width is not None else IntRange(1, 32768)
    fields["height"] = height if height is not None else IntRange(1, 32768)
    return Caps([Structure("video/x-raw", **fields)])


from .buffer import Meta


class VideoCaptionMeta(Meta):
    """Closed-caption data attached to a video buffer.

    gst_video::VideoCaptionMeta analog (the reference's cea608overlay
    consumes exactly these four types, cea608overlay/imp.rs:264-285):

    - "cea608-raw":     byte pairs (field 1)
    - "cea608-s334-1a": SMPTE 334-1 Annex A triplets (field byte, hi, lo)
    - "cea708-raw":     cc_data triplets (marker|type, d1, d2)
    - "cea708-cdp":     full CDP packets
    """

    api = "video-caption"
    TYPES = ("cea608-raw", "cea608-s334-1a", "cea708-raw", "cea708-cdp")

    def __init__(self, caption_type: str, data: bytes):
        if caption_type not in self.TYPES:
            raise ValueError(f"unknown caption type {caption_type!r}")
        self.caption_type = caption_type
        self.data = bytes(data)

    def __repr__(self):
        return f"VideoCaptionMeta({self.caption_type}, {len(self.data)}B)"


__all__ = ["VideoInfo", "VideoCaptionMeta", "video_caps_template", "RGB_FORMATS", "PLANAR_FORMATS"]
