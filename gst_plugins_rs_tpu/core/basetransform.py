"""BaseTransform / AudioFilter / VideoFilter base classes.

Rebuild of the GStreamer BaseTransform chain semantics the reference elements
implement (SURVEY.md §1 "element contract"; e.g.
audio/audiofx/src/audioecho/imp.rs:199-227, audio/hrtf/src/hrtf/imp.rs:548-759):
caps proposal/fixation via transform_caps, set_caps, 1:1 transform /
transform_ip, N:M generate_output with submitted input, passthrough on same
caps, EOS/FLUSH/DISCONT handling hooks, and additive latency reporting.
"""
from __future__ import annotations

import enum
from typing import Optional

from .audio import AudioInfo
from .buffer import Buffer
from .caps import Caps
from .element import (
    Element,
    FlowError,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
)
from .events import Event, EventType, Query, QueryType, Segment
from .video import VideoInfo


class TransformMode(enum.Enum):
    ALWAYS_IN_PLACE = "always-in-place"
    NEVER_IN_PLACE = "never-in-place"


class BaseTransform(Element):
    MODE: TransformMode = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS: bool = False
    TRANSFORM_IP_ON_PASSTHROUGH: bool = True

    SINK_CAPS: Caps = Caps.new_any()
    SRC_CAPS: Caps = Caps.new_any()

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK, PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, self.SINK_CAPS))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC, PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, self.SRC_CAPS))
        )
        self.sinkpad.chain_function = self._sink_chain
        self.sinkpad.event_function = self._sink_event
        self.sinkpad.query_function = self._sink_query
        self.srcpad.query_function = self._src_query
        self.segment: Optional[Segment] = None
        self.in_caps: Optional[Caps] = None
        self.out_caps: Optional[Caps] = None
        self.passthrough = False
        self._queued_input: Optional[Buffer] = None

    # ------------------------------------------------------------------
    # Subclass hooks
    # ------------------------------------------------------------------
    def start(self) -> None: ...
    def stop(self) -> None: ...

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        """Propose caps for the opposite pad. Default: same caps constrained
        by the opposite pad's template."""
        tmpl = self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS
        out = caps.intersect(tmpl)
        if filter_ is not None:
            out = out.intersect(filter_)
        return out

    def fixate_caps(self, direction: PadDirection, caps: Caps, othercaps: Caps) -> Caps:
        return othercaps.fixate()

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None: ...

    def transform(self, inbuf: Buffer) -> Buffer:
        raise NotImplementedError

    def transform_ip(self, buf: Buffer) -> Buffer:
        raise NotImplementedError

    # N:M mode (audiornnoise-style): override generate_output; queued input is
    # available via take_queued_buffer().
    def submit_input_buffer(self, buf: Buffer) -> None:
        self._queued_input = buf

    def take_queued_buffer(self) -> Optional[Buffer]:
        b, self._queued_input = self._queued_input, None
        return b

    def generate_output(self) -> Optional[Buffer]:
        """Return the next output buffer or None when no more output can be
        produced from queued input. Default: 1:1 transform."""
        inbuf = self.take_queued_buffer()
        if inbuf is None:
            return None
        if self.MODE == TransformMode.ALWAYS_IN_PLACE:
            return self.transform_ip(inbuf)
        return self.transform(inbuf)

    def sink_event(self, event: Event) -> bool:
        """Subclass event hook; return False to swallow. Default True."""
        return True

    def drain(self) -> Optional[Buffer]:
        """Flush remaining internal state at EOS; return residue buffer."""
        return None

    def latency_additional_ns(self) -> int:
        return 0

    # ------------------------------------------------------------------
    # State handling
    # ------------------------------------------------------------------
    def on_ready_to_paused(self) -> None:
        self.passthrough = False
        self.start()

    def on_paused_to_ready(self) -> None:
        self.stop()
        self.in_caps = None
        self.out_caps = None
        self.segment = None
        self._queued_input = None

    # ------------------------------------------------------------------
    # Negotiation
    # ------------------------------------------------------------------
    def _negotiate(self, incaps: Caps) -> Caps:
        proposed = self.transform_caps(PadDirection.SINK, incaps, None)
        if proposed.is_empty():
            raise FlowError(FlowReturn.NOT_NEGOTIATED, f"{self.name}: cannot transform {incaps!r}")
        downstream = self.srcpad.peer_query_caps(proposed)
        if downstream.is_empty():
            raise FlowError(
                FlowReturn.NOT_NEGOTIATED, f"{self.name}: downstream rejects {proposed!r}"
            )
        outcaps = downstream if downstream.is_fixed() else self.fixate_caps(PadDirection.SINK, incaps, downstream)
        return outcaps

    def _handle_caps(self, incaps: Caps) -> bool:
        outcaps = self._negotiate(incaps)
        self.in_caps = incaps
        self.out_caps = outcaps
        self.set_caps(incaps, outcaps)
        self.passthrough = self.PASSTHROUGH_ON_SAME_CAPS and incaps == outcaps
        self.srcpad.current_caps = outcaps
        return self.srcpad.push_event(Event.new_caps(outcaps))

    # ------------------------------------------------------------------
    # Dataflow
    # ------------------------------------------------------------------
    def _sink_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if self.in_caps is None:
            return FlowReturn.NOT_NEGOTIATED
        if self.passthrough:
            if self.TRANSFORM_IP_ON_PASSTHROUGH and self.MODE == TransformMode.ALWAYS_IN_PLACE:
                buf = self.transform_ip(buf)
            return self.srcpad.push(buf)
        self.submit_input_buffer(buf)
        while True:
            out = self.generate_output()
            if out is None:
                return FlowReturn.OK
            ret = self.srcpad.push(out)
            if ret not in (FlowReturn.OK,):
                return ret

    def _push_drained(self) -> None:
        residue = self.drain()
        if residue is not None:
            self.srcpad.push(residue)

    def _sink_event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.CAPS:
            if not self.sink_event(event):
                return True
            return self._handle_caps(event.get("caps"))
        if event.type == EventType.SEGMENT:
            self.segment = event.get("segment")
        if event.type == EventType.EOS:
            if self.sink_event(event):
                self._push_drained()
            return self.srcpad.push_event(event)
        if event.type == EventType.FLUSH_STOP:
            self.sink_event(event)
            return self.srcpad.push_event(event)
        if not self.sink_event(event):
            return True
        return self.srcpad.push_event(event)

    # ------------------------------------------------------------------
    # Queries
    # ------------------------------------------------------------------
    def _sink_query(self, pad: Pad, query: Query) -> bool:
        if query.type == QueryType.CAPS:
            filter_ = query.fields.get("filter")
            downstream = self.srcpad.peer_query_caps(None)
            caps = self.transform_caps(PadDirection.SRC, downstream, filter_)
            if caps.is_any():
                caps = self.SINK_CAPS
            elif not self.SINK_CAPS.is_any():
                caps = caps.intersect(self.SINK_CAPS)
            if filter_ is not None:
                caps = filter_.intersect(caps)
            query.result["caps"] = caps
            return True
        return self._default_query(pad, query)

    def _src_query(self, pad: Pad, query: Query) -> bool:
        if query.type == QueryType.CAPS:
            filter_ = query.fields.get("filter")
            caps = self.SRC_CAPS if filter_ is None else filter_.intersect(self.SRC_CAPS)
            query.result["caps"] = caps
            return True
        if query.type == QueryType.LATENCY:
            ok = self.sinkpad.peer_query(query) if self.sinkpad.peer else True
            add = self.latency_additional_ns()
            query.result["min_latency"] = query.result.get("min_latency", 0) + add
            if query.result.get("max_latency") is not None:
                query.result["max_latency"] += add
            return ok
        return self._default_query(pad, query)


class AudioFilter(BaseTransform):
    """BaseTransform specialised for raw audio; parses AudioInfo on set_caps
    and calls setup(info) (reference: AudioFilter subclass hooks,
    audio/audiofx/src/audioecho/imp.rs:229-259)."""

    audio_info: Optional[AudioInfo]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.audio_info = None

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        self.audio_info = AudioInfo.from_caps(incaps)
        self.setup(self.audio_info)

    def setup(self, info: AudioInfo) -> None: ...

    def on_paused_to_ready(self) -> None:
        super().on_paused_to_ready()
        self.audio_info = None


class VideoFilter(BaseTransform):
    """BaseTransform specialised for raw video frames."""

    video_info: Optional[VideoInfo]
    out_video_info: Optional[VideoInfo]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.video_info = None
        self.out_video_info = None

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        self.video_info = VideoInfo.from_caps(incaps)
        self.out_video_info = VideoInfo.from_caps(outcaps)
        self.setup(self.video_info, self.out_video_info)

    def setup(self, in_info: VideoInfo, out_info: VideoInfo) -> None: ...

    def on_paused_to_ready(self) -> None:
        super().on_paused_to_ready()
        self.video_info = None
        self.out_video_info = None


__all__ = ["BaseTransform", "AudioFilter", "VideoFilter", "TransformMode"]
