"""Events, segments, messages and queries.

Rebuild of the GStreamer event/segment/bus-message model that the reference
elements speak (sink_event hooks, segment handling, element messages like
`ebur128-level` — audio/audiofx/src/ebur128level/imp.rs:363-481).
"""
from __future__ import annotations

import enum
import itertools
from typing import Any, Dict, Optional

from .caps import Caps, Structure

_event_seqnums = itertools.count(1)


class SegmentFlags(enum.IntFlag):
    """GstSegmentFlags analog (the subset elements consume)."""

    NONE = 0
    RESET = 1
    SEGMENT = 8  # emit SEGMENT_DONE instead of EOS at the segment end


class Segment:
    """Segment: maps buffer PTS to running time / stream time.

    ``format`` is 'time' (values in ns) or 'bytes' (values are byte
    offsets) — gst_segment's GstFormat. Downstream consumers of a bytes
    segment must not treat start/position as nanoseconds."""

    def __init__(
        self,
        *,
        rate: float = 1.0,
        start: int = 0,
        stop: Optional[int] = None,
        time: int = 0,
        position: int = 0,
        base: int = 0,
        format: str = "time",
        flags: SegmentFlags = SegmentFlags.NONE,
    ):
        self.rate = rate
        self.start = start
        self.stop = stop
        self.time = time
        self.position = position
        self.base = base
        self.format = format
        self.flags = flags

    def to_running_time(self, pts: Optional[int]) -> Optional[int]:
        if pts is None or pts < self.start:
            return None
        return self.base + int((pts - self.start) / self.rate)

    def to_stream_time(self, pts: Optional[int]) -> Optional[int]:
        if pts is None or pts < self.start:
            return None
        return self.time + (pts - self.start)

    def copy(self) -> "Segment":
        return Segment(
            rate=self.rate,
            start=self.start,
            stop=self.stop,
            time=self.time,
            position=self.position,
            base=self.base,
            format=self.format,
            flags=self.flags,
        )

    def __repr__(self):
        return f"Segment(start={self.start}, stop={self.stop}, rate={self.rate})"


class EventType(enum.Enum):
    STREAM_START = "stream-start"
    CAPS = "caps"
    SEGMENT = "segment"
    TAG = "tag"
    EOS = "eos"
    SEGMENT_DONE = "segment-done"
    FLUSH_START = "flush-start"
    FLUSH_STOP = "flush-stop"
    GAP = "gap"
    CUSTOM_DOWNSTREAM = "custom-downstream"
    CUSTOM_UPSTREAM = "custom-upstream"
    SEEK = "seek"  # upstream: reposition the stream (RFC: gst_event_new_seek)
    NAVIGATION = "navigation"  # upstream: user input (gst_event_new_navigation)


class Event:
    def __init__(self, type_: EventType, **fields: Any):
        self.type = type_
        # GstEvent seqnum analog: related events (segment -> segment-done/eos)
        # share one; fresh events draw from a process-wide counter.
        self.seqnum: int = fields.pop("seqnum", None) or next(_event_seqnums)
        self.fields: Dict[str, Any] = fields

    # convenience constructors ------------------------------------------------
    @staticmethod
    def new_stream_start(stream_id: str) -> "Event":
        return Event(EventType.STREAM_START, stream_id=stream_id)

    @staticmethod
    def new_caps(caps: Caps) -> "Event":
        if not caps.is_fixed():
            raise ValueError(f"caps event requires fixed caps, got {caps!r}")
        return Event(EventType.CAPS, caps=caps)

    @staticmethod
    def new_segment(segment: Segment, *, seqnum: Optional[int] = None) -> "Event":
        return Event(EventType.SEGMENT, segment=segment, seqnum=seqnum)

    @staticmethod
    def new_eos(*, seqnum: Optional[int] = None) -> "Event":
        return Event(EventType.EOS, seqnum=seqnum)

    @staticmethod
    def new_segment_done(position: Optional[int] = None, *,
                         seqnum: Optional[int] = None) -> "Event":
        """End-of-segment marker for SegmentFlags.SEGMENT playback
        (gst_event_new_segment_done)."""
        return Event(EventType.SEGMENT_DONE, position=position, seqnum=seqnum)

    @staticmethod
    def new_flush_start() -> "Event":
        return Event(EventType.FLUSH_START)

    @staticmethod
    def new_flush_stop(reset_time: bool = True) -> "Event":
        return Event(EventType.FLUSH_STOP, reset_time=reset_time)

    @staticmethod
    def new_gap(pts: int, duration: Optional[int]) -> "Event":
        return Event(EventType.GAP, pts=pts, duration=duration)

    @staticmethod
    def new_seek(start: int, stop: Optional[int] = None, *, rate: float = 1.0,
                 flush: bool = True, fmt: str = "time") -> "Event":
        """Upstream seek (gst_event_new_seek): fmt 'time' (ns) or 'bytes'."""
        return Event(EventType.SEEK, start=start, stop=stop, rate=rate,
                     flush=flush, format=fmt)

    @staticmethod
    def new_navigation(structure: Structure) -> "Event":
        """Upstream user-input event (gst_event_new_navigation): the
        structure carries event=<kind> plus kind-specific fields
        (x/y/button/key...), matching GstNavigation's structure shape."""
        return Event(EventType.NAVIGATION, structure=structure)

    def get(self, key: str, default: Any = None) -> Any:
        return self.fields.get(key, default)

    def __repr__(self):
        return f"Event({self.type.value}, {self.fields})"


class MessageType(enum.Enum):
    ELEMENT = "element"
    EOS = "eos"
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"
    STATE_CHANGED = "state-changed"
    LATENCY = "latency"
    APPLICATION = "application"
    # decodebin3-analog stream topology messages (uriplaylistbin posts one
    # pair per media change, like GstMessageStreamCollection /
    # GstMessageStreamsSelected in the reference's uriplaylistbin tests)
    STREAM_COLLECTION = "stream-collection"
    STREAMS_SELECTED = "streams-selected"


class Message:
    """Bus message. Element messages carry a Structure payload
    (e.g. name='ebur128-level' with loudness fields)."""

    def __init__(self, type_: MessageType, src: Any = None, structure: Optional[Structure] = None, **fields: Any):
        self.type = type_
        self.src = src
        self.structure = structure
        self.fields = fields

    def __repr__(self):
        return f"Message({self.type.value}, src={getattr(self.src, 'name', self.src)}, {self.structure!r})"


class QueryType(enum.Enum):
    CAPS = "caps"
    LATENCY = "latency"
    POSITION = "position"
    DURATION = "duration"
    SEEKING = "seeking"
    ALLOCATION = "allocation"


class Query:
    """Mutable query object; handlers fill in result fields."""

    def __init__(self, type_: QueryType, **fields: Any):
        self.type = type_
        self.fields: Dict[str, Any] = fields
        self.result: Dict[str, Any] = {}
        self.handled = False

    @staticmethod
    def new_caps(filter_: Optional[Caps] = None) -> "Query":
        return Query(QueryType.CAPS, filter=filter_)

    @staticmethod
    def new_latency() -> "Query":
        q = Query(QueryType.LATENCY)
        q.result.update(live=False, min_latency=0, max_latency=None)
        return q

    @staticmethod
    def new_position() -> "Query":
        return Query(QueryType.POSITION)

    @staticmethod
    def new_duration() -> "Query":
        return Query(QueryType.DURATION)

    @staticmethod
    def new_seeking() -> "Query":
        q = Query(QueryType.SEEKING)
        q.result.update(seekable=False)
        return q

    def __repr__(self):
        return f"Query({self.type.value}, fields={self.fields}, result={self.result})"


__all__ = [
    "Segment",
    "SegmentFlags",
    "Event",
    "EventType",
    "Message",
    "MessageType",
    "Query",
    "QueryType",
]
