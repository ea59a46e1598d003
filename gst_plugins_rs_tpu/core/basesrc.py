"""BaseSrc / BaseSink: push-model source and sink base classes."""
from __future__ import annotations

import itertools
from typing import Optional

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
from .events import Event, EventType, Message, MessageType, Query, QueryType, Segment

_stream_id_counter = itertools.count()


class BaseSrc(Element):
    """Push source: negotiate caps then produce buffers via create()."""

    SRC_CAPS: Caps = Caps.new_any()
    IS_LIVE: bool = False
    #: the GstFormat this source seeks in: 'time' (ns) or 'bytes'.
    #: gst_base_src rejects seeks in a mismatched format
    #: (gstbasesrc.c perform_seek format check); byte-domain sources
    #: (rsfilesrc, reqwesthttpsrc, awss3src) set 'bytes' so a
    #: Pipeline.seek() time broadcast cannot silently become a byte offset.
    SEEK_FORMAT: str = "time"
    #: sentinel create() may return meaning "no data right now, not EOS"
    RETRY = object()

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC, PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, self.SRC_CAPS))
        )
        self.srcpad.query_function = self._src_query
        self.srcpad.event_function = self._src_event
        self.out_caps: Optional[Caps] = None
        self._started_stream = False
        self._eos_sent = False
        self.segment = Segment(format=self.SEEK_FORMAT)

    # -- subclass hooks -----------------------------------------------------
    def start(self) -> None: ...
    def stop(self) -> None: ...

    def is_seekable(self) -> bool:
        """Whether this source can reposition (gst_base_src is_seekable)."""
        return False

    def do_seek(self, segment: Segment) -> bool:
        """Reposition so the next create() produces from segment.start
        (time-ns, or bytes for fmt='bytes' seeks). Return False to refuse."""
        return False

    def fixate(self, caps: Caps) -> Caps:
        return caps.fixate()

    def negotiated(self, caps: Caps) -> None:
        """Called with the final fixed caps before streaming."""

    def create(self) -> Optional[Buffer]:
        """Produce the next buffer; None signals EOS."""
        raise NotImplementedError

    # -- state --------------------------------------------------------------
    def on_ready_to_paused(self) -> None:
        self._started_stream = False
        self._eos_sent = False
        self.start()

    def on_paused_to_ready(self) -> None:
        self.stop()
        self.out_caps = None

    # -- streaming ----------------------------------------------------------
    def negotiate(self) -> Caps:
        tmpl = self.srcpad.pad_template_caps()
        peer = self.srcpad.peer_query_caps(tmpl)
        caps = tmpl.intersect(peer)
        if caps.is_empty():
            raise FlowError(FlowReturn.NOT_NEGOTIATED, f"{self.name}: no common caps with peer")
        caps = self.fixate(caps)
        return caps

    def send_stream_start(self) -> None:
        sid = f"{self.name}-{next(_stream_id_counter)}"
        self.srcpad.push_event(Event.new_stream_start(sid))
        caps = self.negotiate()
        self.out_caps = caps
        self.negotiated(caps)
        self.srcpad.current_caps = caps
        self.srcpad.push_event(Event.new_caps(caps))
        self.srcpad.push_event(Event.new_segment(self.segment))
        self._started_stream = True

    def _is_live(self) -> bool:
        if getattr(self, "IS_LIVE", False):
            return True
        return bool(self._props.get("is-live"))

    def _live_wait(self, buf: Buffer) -> None:
        """Clock-paced live sources: block until the buffer's running time
        (the C core's sync-to-clock for live sources; with no pipeline
        clock this is a no-op and the round-robin scheduler free-runs)."""
        if self.clock is None or buf.pts is None or not self._is_live():
            return
        target = self.base_time + buf.pts
        if self.clock.now() < target:
            self.clock.new_single_shot_id(target).wait()

    def iterate(self) -> FlowReturn:
        """Produce and push one buffer; push EOS when exhausted."""
        if self._eos_sent:
            return FlowReturn.EOS
        if not self._started_stream:
            self.send_stream_start()
        buf = self.create()
        self._last_was_retry = buf is BaseSrc.RETRY
        if buf is BaseSrc.RETRY:
            return FlowReturn.OK
        if buf is None:
            if getattr(self, "_errored", False):
                # the source posted an ERROR bus message: stop streaming
                # WITHOUT fabricating an EOS — in GStreamer an erroring
                # source halts the stream, it does not end it cleanly
                # (uriplaylistbin missing_file/missing_http expect eos=false,
                # reference tests/uriplaylistbin.rs:449-489)
                self._eos_sent = True
                return FlowReturn.EOS
            self.srcpad.push_event(Event.new_eos())
            self._eos_sent = True
            return FlowReturn.EOS
        self._live_wait(buf)
        return self.srcpad.push(buf)

    # -- seeking (the flushing-seek protocol, gstbasesrc.c model) ------------
    def _src_event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.SEEK:
            return self.handle_seek(event)
        return True

    def send_event(self, event: Event) -> bool:
        """Element-level event entry (gst_element_send_event analog)."""
        if event.type == EventType.SEEK:
            return self.handle_seek(event)
        return False

    def handle_seek(self, event: Event) -> bool:
        if not self.is_seekable():
            return False
        fmt = event.get("format", "time")
        if fmt != self.SEEK_FORMAT:
            # gst_base_src refuses seeks in a format it cannot convert:
            # a time-format broadcast must not become a byte offset.
            return False
        start = int(event.get("start", 0))
        stop = event.get("stop")
        seg = Segment(rate=float(event.get("rate", 1.0)), start=start,
                      stop=stop, time=start, position=start, format=fmt)
        flush = event.get("flush", True)
        if flush and self._started_stream:
            self.srcpad.push_event(Event(EventType.FLUSH_START))
        ok = self.do_seek(seg)
        if flush and self._started_stream:
            self.srcpad.push_event(Event(EventType.FLUSH_STOP))
        if not ok:
            return False
        self.segment = seg
        self._eos_sent = False
        if self._started_stream:
            self.srcpad.push_event(Event.new_segment(seg))
        return True

    def _src_query(self, pad: Pad, query: Query) -> bool:
        if query.type == QueryType.CAPS:
            filter_ = query.fields.get("filter")
            caps = self.SRC_CAPS if filter_ is None else filter_.intersect(self.SRC_CAPS)
            query.result["caps"] = caps
            return True
        if query.type == QueryType.LATENCY:
            query.result.update(live=self._is_live(), min_latency=0, max_latency=None)
            return True
        if query.type == QueryType.SEEKING:
            query.result.update(seekable=self.is_seekable(),
                                start=0, stop=self.duration_ns())
            return True
        if query.type == QueryType.POSITION:
            pos = self.position_ns()
            if pos is None:
                return False
            query.result["position"] = pos
            return True
        if query.type == QueryType.DURATION:
            dur = self.duration_ns()
            if dur is None:
                return False
            query.result["duration"] = dur
            return True
        return False

    def position_ns(self) -> Optional[int]:
        """Current stream position (POSITION query); None = unknown."""
        return None

    def duration_ns(self) -> Optional[int]:
        """Total duration (DURATION query); None = unknown/unbounded."""
        return None


class BaseSink(Element):
    """Sink base: receives buffers via render(), posts EOS on the bus."""

    SINK_CAPS: Caps = Caps.new_any()

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK, PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, self.SINK_CAPS))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self.caps: Optional[Caps] = None
        self.eos = False

    def render(self, buffer: Buffer) -> FlowReturn:
        return FlowReturn.OK

    def on_caps(self, caps: Caps) -> None: ...
    def on_event(self, event: Event) -> None: ...

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        return self.render(buf)

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.CAPS:
            self.caps = event.get("caps")
            self.on_caps(self.caps)
        elif event.type == EventType.EOS:
            self.eos = True
            self.post_message(Message(MessageType.EOS))
        self.on_event(event)
        return True


__all__ = ["BaseSrc", "BaseSink"]
