"""Buffer: timestamped data unit flowing through pads.

Rebuild of the GStreamer Buffer contract (PTS/DTS/duration/offset/flags/meta)
with the payload held as a device-resident jax.Array (or numpy array for host
paths).  Timestamps are integer nanoseconds (exact arithmetic, like
gst::ClockTime) — PTS bookkeeping must stay host-side and exact
(reference tests assert <=1 ns drift, audio/audiofx/tests/audioloudnorm.rs:124-146).
"""
from __future__ import annotations

import enum
from typing import Any, List, Optional

# Sentinel matching GST_CLOCK_TIME_NONE semantics.
CLOCK_TIME_NONE: Optional[int] = None
SECOND = 1_000_000_000
MSECOND = 1_000_000
USECOND = 1_000
NSECOND = 1


class BufferFlags(enum.Flag):
    NONE = 0
    DISCONT = enum.auto()
    RESYNC = enum.auto()
    GAP = enum.auto()
    DELTA_UNIT = enum.auto()
    HEADER = enum.auto()
    LAST = enum.auto()
    MARKER = enum.auto()


class Meta:
    """Base class for typed metadata attached to buffers.

    Analog of GstMeta; subclasses: AudioLevelMeta
    (reference: audio/audiofx/src/audiornnoise/imp.rs:132-138), TensorMeta,
    AnalyticsRelationMeta (analytics/).
    """

    api: str = "meta"


class Buffer:
    __slots__ = ("data", "pts", "dts", "duration", "offset", "offset_end", "flags", "metas")

    def __init__(
        self,
        data: Any = None,
        *,
        pts: Optional[int] = CLOCK_TIME_NONE,
        dts: Optional[int] = CLOCK_TIME_NONE,
        duration: Optional[int] = CLOCK_TIME_NONE,
        offset: Optional[int] = None,
        offset_end: Optional[int] = None,
        flags: BufferFlags = BufferFlags.NONE,
    ):
        self.data = data
        self.pts = pts
        self.dts = dts
        self.duration = duration
        self.offset = offset
        self.offset_end = offset_end
        self.flags = flags
        self.metas: List[Meta] = []

    # -- flags -------------------------------------------------------------
    def has_flag(self, flag: BufferFlags) -> bool:
        return bool(self.flags & flag)

    def set_flag(self, flag: BufferFlags) -> None:
        self.flags |= flag

    def unset_flag(self, flag: BufferFlags) -> None:
        self.flags &= ~flag

    # -- meta ---------------------------------------------------------------
    def add_meta(self, meta: Meta) -> None:
        self.metas.append(meta)

    def get_meta(self, cls) -> Optional[Meta]:
        for m in self.metas:
            if isinstance(m, cls):
                return m
        return None

    def iter_meta(self, cls):
        return (m for m in self.metas if isinstance(m, cls))

    # -- misc ----------------------------------------------------------------
    def copy_metadata_from(self, other: "Buffer") -> None:
        self.pts = other.pts
        self.dts = other.dts
        self.duration = other.duration
        self.offset = other.offset
        self.offset_end = other.offset_end
        self.flags = other.flags
        self.metas = list(other.metas)

    @property
    def n_frames(self) -> int:
        """Leading-axis length of the payload (audio frames / 1 for video);
        0 for non-array payloads (text, batch containers)."""
        shape = getattr(self.data, "shape", None)
        return int(shape[0]) if shape else 0

    def __repr__(self):
        def t(v):
            return "NONE" if v is None else f"{v / SECOND:.6f}s"

        shape = getattr(self.data, "shape", None)
        return (
            f"Buffer(shape={shape}, pts={t(self.pts)}, dur={t(self.duration)}, "
            f"offset={self.offset}, flags={self.flags})"
        )


__all__ = [
    "Buffer",
    "BufferFlags",
    "Meta",
    "CLOCK_TIME_NONE",
    "SECOND",
    "MSECOND",
    "USECOND",
    "NSECOND",
]
