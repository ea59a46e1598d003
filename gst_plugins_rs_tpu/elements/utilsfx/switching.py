"""Failure-detection / recovery elements: fallbackswitch, livesync,
togglerecord.

Parity targets (SURVEY.md §5): utils/fallbackswitch (priority-based input
selector with per-pad priority + is-healthy, auto-switch,
fallbackswitch/imp.rs:20-126), utils/livesync (repeats the last buffer to
fill gaps, livesync/imp.rs:9-40) and utils/togglerecord (gap-free record
valve).  The synchronous scheduler has no wall clock; "timeout" failure
detection maps to GAP events and EOS (the reference's tests drive failures
the same way, via DISCONT/gap injection — SURVEY.md §5 fault injection).
"""
from __future__ import annotations

from typing import Dict, Optional

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
    Element,
    Event,
    EventType,
    FlowReturn,
    Message,
    MessageType,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    SECOND,
    Structure,
    TransformMode,
    register,
)
from ...core.aggregator import Aggregator, AggregatorPad


class FallbackSinkPad(AggregatorPad):
    def __init__(self, name: str, template: PadTemplate, priority: int):
        super().__init__(name, template)
        self.priority = priority
        self.is_healthy = True


@register
class FallbackSwitch(Aggregator):
    ELEMENT_NAME = "fallbackswitch"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Forwards the highest-priority healthy input"
    PROPERTIES = [
        Prop("timeout", SECOND, type="uint64", mutable="playing",
             doc="Health timeout (gap/EOS driven in the synchronous scheduler)"),
        Prop("immediate-fallback", False, type="bool", mutable="playing"),
        Prop("auto-switch", True, type="bool", mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._active: Optional[FallbackSinkPad] = None
        self._sent_caps_for: Optional[FallbackSinkPad] = None

    def request_sink_pad(self, name: Optional[str] = None) -> FallbackSinkPad:
        idx = self._pad_counter
        if name is None:
            name = f"sink_{idx}"
        self._pad_counter += 1
        pad = FallbackSinkPad(name, self._sink_template, priority=idx)
        pad.chain_function = self._sink_chain
        pad.event_function = self._sink_event
        pad.query_function = self._sink_query
        return self.add_pad(pad)  # type: ignore[return-value]

    def set_pad_priority(self, pad: FallbackSinkPad, priority: int) -> None:
        pad.priority = priority

    def set_pad_healthy(self, pad: FallbackSinkPad, healthy: bool) -> None:
        pad.is_healthy = healthy
        self._try_aggregate()

    def _pick_active(self) -> Optional[FallbackSinkPad]:
        candidates = [
            p for p in self.agg_pads() if p.is_healthy and not p.is_inactive()  # type: ignore[attr-defined]
        ]
        if not candidates:
            return None
        return min(candidates, key=lambda p: p.priority)  # type: ignore[attr-defined]

    def aggregate(self, timeout: bool) -> FlowReturn:
        if self.get_property("auto-switch") or self._active is None:
            new_active = self._pick_active()
        else:
            new_active = self._active if not self._active.is_inactive() else self._pick_active()
        if new_active is not self._active:
            self._active = new_active
            self.post_message(
                Message(
                    MessageType.ELEMENT,
                    structure=Structure(
                        "fallbackswitch-active-pad-changed",
                        pad=None if new_active is None else new_active.name,
                    ),
                )
            )
        ret = FlowReturn.OK
        for pad in self.agg_pads():
            if pad is self._active:
                if self._sent_caps_for is not pad and pad.current_caps is not None:
                    self.srcpad.current_caps = pad.current_caps
                    self.srcpad.push_event(Event.new_caps(pad.current_caps))
                    self._sent_caps_for = pad
                while pad.queue:
                    ret = self.finish_buffer(pad.pop_buffer())
            else:
                pad.queue.clear()  # drop inactive inputs
        return ret

    def _try_aggregate(self) -> FlowReturn:
        # forward as soon as the active pad has data; drop others eagerly
        ret = FlowReturn.OK
        pads = self.agg_pads()
        if not pads:
            return ret
        active = self._pick_active() if self.get_property("auto-switch") or self._active is None else self._active
        if active is None:
            if all(p.is_inactive() for p in pads):
                self.srcpad.push_event(Event.new_eos())
            return ret
        if active.has_buffer() or active is not self._active:
            ret = self.aggregate(timeout=False)
        return ret


@register
class LiveSync(BaseTransform):
    ELEMENT_NAME = "livesync"
    ELEMENT_CLASS = "Filter/Generic"
    ELEMENT_DESCRIPTION = "Fills stream gaps by repeating the last buffer"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PROPERTIES = [
        Prop("latency", 0, type="uint64", mutable="playing"),
        Prop("single-segment", False, type="bool", mutable="ready"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._last: Optional[Buffer] = None

    def start(self) -> None:
        self._last = None

    def transform_ip(self, buf: Buffer) -> Buffer:
        self._last = buf
        return buf

    def sink_event(self, event: Event) -> bool:
        if event.type == EventType.GAP and self._last is not None:
            # repeat the last buffer over the gap (livesync/imp.rs:9-40)
            pts = event.get("pts")
            duration = event.get("duration")
            repeat = Buffer(self._last.data, pts=pts, duration=duration)
            self.srcpad.push(repeat)
            return False  # swallow the gap event
        return True


@register
class ToggleRecord(BaseTransform):
    ELEMENT_NAME = "togglerecord"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Record valve: passes buffers while recording, closing PTS gaps"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PROPERTIES = [
        Prop("record", False, type="bool", mutable="playing"),
        Prop("is-live", False, type="bool", mutable="ready"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._offset = 0  # accumulated removed time
        self._stop_pts: Optional[int] = None
        self._was_recording = False

    def start(self) -> None:
        self._offset = 0
        self._stop_pts = None
        self._was_recording = False

    def generate_output(self) -> Optional[Buffer]:
        buf = self.take_queued_buffer()
        if buf is None:
            return None
        recording = self.get_property("record")
        if not recording:
            if self._was_recording:
                self._stop_pts = buf.pts
                self._was_recording = False
            return None  # drop
        if not self._was_recording:
            # resumed: grow the offset by the skipped span
            if self._stop_pts is not None and buf.pts is not None:
                self._offset += buf.pts - self._stop_pts
            self._was_recording = True
        if buf.pts is not None:
            buf = Buffer(buf.data, pts=buf.pts - self._offset, duration=buf.duration,
                         offset=buf.offset, offset_end=buf.offset_end)
        return buf


__all__ = ["FallbackSwitch", "LiveSync", "ToggleRecord"]
