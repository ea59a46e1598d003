"""Audio format descriptions (AudioInfo analog) and channel positions.

Payload convention: audio buffers carry arrays shaped [frames, channels]
(channels-last == interleaved memory order).  `format` in caps names the
nominal sample format (F32/F64/S16/S32); arrays use the mapped dtype.
"""
from __future__ import annotations

import enum
from typing import List, Optional, Sequence

import numpy as np

from .buffer import SECOND
from .caps import Caps, IntRange, Structure, ValueList

FORMAT_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "S32": np.int32,
    "S24LE": np.uint8,  # 3-byte packed samples: carried as raw bytes
    "S16": np.int16,
    "U8": np.uint8,
}

FORMAT_WIDTHS = {"F64": 8, "F32": 4, "S32": 4, "S24LE": 3, "S16": 2, "U8": 1}


class AudioLayout(enum.Enum):
    INTERLEAVED = "interleaved"
    NON_INTERLEAVED = "non-interleaved"


class ChannelPosition(enum.Enum):
    MONO = "mono"
    FRONT_LEFT = "front-left"
    FRONT_RIGHT = "front-right"
    FRONT_CENTER = "front-center"
    LFE1 = "lfe1"
    REAR_LEFT = "rear-left"
    REAR_RIGHT = "rear-right"
    SIDE_LEFT = "side-left"
    SIDE_RIGHT = "side-right"
    REAR_CENTER = "rear-center"
    NONE = "none"


def default_channel_positions(channels: int) -> List[ChannelPosition]:
    P = ChannelPosition
    table = {
        1: [P.MONO],
        2: [P.FRONT_LEFT, P.FRONT_RIGHT],
        3: [P.FRONT_LEFT, P.FRONT_RIGHT, P.FRONT_CENTER],
        4: [P.FRONT_LEFT, P.FRONT_RIGHT, P.REAR_LEFT, P.REAR_RIGHT],
        5: [P.FRONT_LEFT, P.FRONT_RIGHT, P.FRONT_CENTER, P.REAR_LEFT, P.REAR_RIGHT],
        6: [P.FRONT_LEFT, P.FRONT_RIGHT, P.FRONT_CENTER, P.LFE1, P.REAR_LEFT, P.REAR_RIGHT],
        8: [
            P.FRONT_LEFT,
            P.FRONT_RIGHT,
            P.FRONT_CENTER,
            P.LFE1,
            P.REAR_LEFT,
            P.REAR_RIGHT,
            P.SIDE_LEFT,
            P.SIDE_RIGHT,
        ],
    }
    if channels in table:
        return table[channels]
    return [P.NONE] * channels


class AudioInfo:
    def __init__(
        self,
        format: str,
        rate: int,
        channels: int,
        layout: AudioLayout = AudioLayout.INTERLEAVED,
        positions: Optional[Sequence[ChannelPosition]] = None,
    ):
        if format not in FORMAT_DTYPES:
            raise ValueError(f"unknown audio format {format}")
        self.format = format
        self.rate = int(rate)
        self.channels = int(channels)
        self.layout = layout
        self.positions = list(positions) if positions else default_channel_positions(channels)

    @property
    def dtype(self):
        return FORMAT_DTYPES[self.format]

    @property
    def bpf(self) -> int:
        """Bytes per frame (all channels)."""
        return FORMAT_WIDTHS[self.format] * self.channels

    def frames_to_time(self, frames: int) -> int:
        return frames * SECOND // self.rate

    def time_to_frames(self, t: int) -> int:
        return t * self.rate // SECOND

    @staticmethod
    def from_caps(caps: Caps) -> "AudioInfo":
        s = caps.structure(0)
        if s.name != "audio/x-raw":
            raise ValueError(f"not audio caps: {caps!r}")
        layout = AudioLayout(s.get("layout", "interleaved"))
        return AudioInfo(s["format"], s["rate"], s["channels"], layout)

    def to_caps(self) -> Caps:
        return Caps.builder(
            "audio/x-raw",
            format=self.format,
            rate=self.rate,
            channels=self.channels,
            layout=self.layout.value,
        )

    def __repr__(self):
        return f"AudioInfo({self.format}@{self.rate}Hz x{self.channels})"

    def __eq__(self, other):
        return (
            isinstance(other, AudioInfo)
            and (self.format, self.rate, self.channels, self.layout)
            == (other.format, other.rate, other.channels, other.layout)
        )


def audio_caps_template(
    formats: Sequence[str] = ("F32", "F64"),
    rate=None,
    channels=None,
    layouts: Sequence[str] = ("interleaved",),
) -> Caps:
    """Build an audio/x-raw caps template (unfixed)."""
    fields = {}
    fields["format"] = formats[0] if len(formats) == 1 else ValueList(formats)
    fields["rate"] = rate if rate is not None else IntRange(1, 2_822_400)
    fields["channels"] = channels if channels is not None else IntRange(1, 64)
    fields["layout"] = layouts[0] if len(layouts) == 1 else ValueList(layouts)
    return Caps([Structure("audio/x-raw", **fields)])


__all__ = [
    "AudioInfo",
    "AudioLayout",
    "ChannelPosition",
    "audio_caps_template",
    "default_channel_positions",
    "FORMAT_DTYPES",
]
