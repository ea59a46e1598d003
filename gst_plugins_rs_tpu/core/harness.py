"""Single-element test harness (gst_check::Harness analog).

Wraps one element with fake src/sink pads; tests push buffers/events and pull
outputs, asserting sample-exactness and PTS/offset bookkeeping — the pattern
of the reference's tier-2 tests (SURVEY.md §4;
audio/audiofx/tests/audiornnoise.rs:38-80).
"""
from __future__ import annotations

from collections import deque
from typing import List, Optional

from .buffer import Buffer
from .bus import Bus
from .caps import Caps
from .element import Element, FlowReturn, Pad, PadDirection, State
from .events import Event, EventType, Query, Segment


class _HarnessHost:
    """Minimal pipeline stand-in giving the element a bus + tracer list."""

    def __init__(self):
        self.bus = Bus()
        self.tracers: List = []
        self.parent = None


class Harness:
    def __init__(self, element: Element, play: bool = True):
        self.element = element
        self.host = _HarnessHost()
        if element.parent is None:
            element.parent = self.host
        self.bus = self.host.bus

        self.buffers: deque = deque()
        self.events: List[Event] = []
        self.src_events: List[Event] = []  # upstream events received by harness src pad

        sinks = element.sink_pads()
        srcs = element.src_pads()
        self.srcpad: Optional[Pad] = None
        self.sinkpad: Optional[Pad] = None
        if sinks:
            self.srcpad = Pad("harness-src", PadDirection.SRC)
            self.srcpad.event_function = self._upstream_event
            self.srcpad.link(sinks[0])
        if srcs:
            self.sinkpad = Pad("harness-sink", PadDirection.SINK)
            self.sinkpad.chain_function = self._chain
            self.sinkpad.event_function = self._event
            srcs[0].link(self.sinkpad)
        if play:
            element.set_state(State.PLAYING)

    # -- capture ------------------------------------------------------------
    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        self.buffers.append(buf)
        return FlowReturn.OK

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.CAPS:
            pad.current_caps = event.get("caps")
        self.events.append(event)
        return True

    def _upstream_event(self, pad: Pad, event: Event) -> bool:
        self.src_events.append(event)
        return True

    # -- driving ------------------------------------------------------------
    def set_src_caps(self, caps: Caps) -> None:
        assert self.srcpad is not None
        self.srcpad.push_event(Event.new_stream_start("harness-stream"))
        self.srcpad.push_event(Event.new_caps(caps))
        self.srcpad.push_event(Event.new_segment(Segment()))

    def push(self, buf: Buffer) -> FlowReturn:
        assert self.srcpad is not None
        return self.srcpad.push(buf)

    def push_event(self, event: Event) -> bool:
        assert self.srcpad is not None
        return self.srcpad.push_event(event)

    def push_eos(self) -> bool:
        return self.push_event(Event.new_eos())

    def pull(self) -> Buffer:
        if not self.buffers:
            raise AssertionError("harness: no buffer to pull")
        return self.buffers.popleft()

    def try_pull(self) -> Optional[Buffer]:
        return self.buffers.popleft() if self.buffers else None

    def pull_all(self) -> List[Buffer]:
        out = list(self.buffers)
        self.buffers.clear()
        return out

    def buffers_received(self) -> int:
        return len(self.buffers)

    def out_caps(self) -> Optional[Caps]:
        return self.sinkpad.current_caps if self.sinkpad else None

    def query_latency(self) -> Query:
        q = Query.new_latency()
        srcs = self.element.src_pads()
        assert srcs
        srcs[0].query(q)
        return q

    def teardown(self) -> None:
        self.element.set_state(State.NULL)


__all__ = ["Harness"]
