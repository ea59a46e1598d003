"""Failure-detection / recovery elements: fallbackswitch, livesync,
togglerecord.

Parity targets (SURVEY.md §5): utils/fallbackswitch (priority-based input
selector with per-pad priority + is-healthy, auto-switch and a clock-armed
`timeout` that switches to the next healthy lower-priority input when the
active one stalls, fallbackswitch/imp.rs:20-29,57-68,88-126), utils/livesync
(repeats the last buffer on missed deadlines, livesync/imp.rs:9-40) and
utils/togglerecord (multi-stream synchronized record valve — see togglerecord.py).

Clocked pipelines (core/clock.py) get the reference's real time-based
behavior: fallbackswitch arms a single-shot clock id per deadline and
switches on expiry with no data; livesync re-pushes the last buffer each
period while upstream stalls.  Clockless pipelines/harnesses keep the
event-driven path (GAP events and EOS), which the reference's tests also
exercise via DISCONT/gap injection (SURVEY.md §5).
"""
from __future__ import annotations

import threading
from typing import Optional

from ...core import (
    BaseTransform,
    Buffer,
    Event,
    EventType,
    FlowReturn,
    Message,
    MessageType,
    Pad,
    PadTemplate,
    Prop,
    SECOND,
    Structure,
    TransformMode,
    register,
)
from ...core.aggregator import Aggregator, AggregatorPad


class FallbackSinkPad(AggregatorPad):
    """Per-pad surface parity: GstFallbackSwitchSinkPad priority/is-healthy
    (reference utils/fallbackswitch/src/fallbackswitch/imp.rs:57-68)."""

    def __init__(self, name: str, template: PadTemplate, priority: int):
        super().__init__(name, template)
        self.priority = priority
        self.is_healthy = True
        self.timed_out = False  # set when the clock timeout expires with no data


@register
class FallbackSwitch(Aggregator):
    ELEMENT_NAME = "fallbackswitch"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Forwards the highest-priority healthy input"
    PROPERTIES = [
        Prop("timeout", SECOND, type="uint64", mutable="playing",
             doc="Switch to the next healthy input after this long without "
                 "data on the active one (clock-armed; 0 disables)"),
        Prop("immediate-fallback", False, type="bool", mutable="playing"),
        Prop("auto-switch", True, type="bool", mutable="playing"),
        Prop("active-pad", None, type="object", mutable="playing",
             doc="(read; settable when auto-switch=false) the pad whose "
                 "buffers flow — a pad object or its name"),
        Prop("latency", 0, type="uint64", mutable="playing",
             doc="extra latency to report downstream"),
        Prop("min-upstream-latency", 0, type="uint64", mutable="playing",
             doc="floor for the upstream latency used in the timeout "
                 "bookkeeping"),
        Prop("stop-on-eos", False, type="bool", mutable="playing",
             doc="forward EOS from the active pad instead of switching to "
                 "a healthy lower-priority input"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._active: Optional[FallbackSinkPad] = None
        self._sent_caps_for: Optional[FallbackSinkPad] = None
        self._flow_lock = threading.RLock()
        self._timeout_id = None

    def get_property(self, name: str):
        if name == "active-pad":
            return self._active
        return super().get_property(name)

    def set_property(self, name: str, value) -> None:
        if name == "active-pad":
            if self.get_property("auto-switch"):
                raise RuntimeError(
                    f"{self.ELEMENT_NAME}: active-pad is only settable "
                    "with auto-switch=false")
            pad = value if not isinstance(value, str) else self.pads.get(value)
            with self._flow_lock:
                self._active = pad
            return
        super().set_property(name, value)

    def latency_additional_ns(self) -> int:
        return self.get_property("latency")

    # -- clock-armed health timeout (fallbackswitch/imp.rs:88-126) ---------
    def on_paused_to_playing(self) -> None:
        self._arm_timeout()

    def on_playing_to_paused(self) -> None:
        self._cancel_timeout()

    def _cancel_timeout(self) -> None:
        with self._flow_lock:
            if self._timeout_id is not None:
                self._timeout_id.unschedule()
                self._timeout_id = None

    def _arm_timeout(self) -> None:
        timeout = self.get_property("timeout")
        if self.clock is None or not timeout:
            return
        with self._flow_lock:
            if self._timeout_id is not None:
                self._timeout_id.unschedule()
            cid = self.clock.new_single_shot_id(self.clock.now() + timeout)
            self._timeout_id = cid
            cid.wait_async(self._on_timeout)

    def _on_timeout(self, cid) -> None:
        with self._flow_lock:
            if cid is not self._timeout_id or cid._unscheduled:
                return
            self._timeout_id = None
            # the active input missed its deadline -> failed until it
            # produces data again
            pad = self._active if self._active is not None else self._pick_active()
            if pad is not None:
                pad.timed_out = True
            self._try_aggregate()
        self._arm_timeout()

    def _sink_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        with self._flow_lock:
            pad.timed_out = False  # data flowing again -> healthy
            ret = super()._sink_chain(pad, buf)
            if pad is self._active:
                self._arm_timeout()  # deadline = last active buffer + timeout
            return ret

    PAD_PROPERTIES = {
        "sink": [
            Prop("priority", 0, type="uint", mutable="playing",
                 doc="pad priority; lower wins (0 = highest). New request "
                     "pads default to their request order."),
            Prop("is-healthy", True, type="bool", mutable="playing",
                 doc="whether this input is currently usable; unhealthy "
                     "pads are skipped when picking the active input"),
        ],
    }

    def request_sink_pad(self, name: Optional[str] = None) -> FallbackSinkPad:
        idx = self._pad_counter
        if name is None:
            name = f"sink_{idx}"
        self._pad_counter += 1
        pad = FallbackSinkPad(name, self._sink_template, priority=idx)
        pad.chain_function = self._sink_chain
        pad.event_function = self._sink_event
        pad.query_function = self._sink_query
        self.add_pad(pad)
        pad._props["priority"] = idx  # default = request order
        return pad

    def pad_property_changed(self, pad, name: str, value) -> None:
        if name == "priority":
            pad.priority = value
        elif name == "is-healthy":
            self.set_pad_healthy(pad, value)

    def set_pad_priority(self, pad: FallbackSinkPad, priority: int) -> None:
        pad.priority = priority
        pad._props["priority"] = priority

    def set_pad_healthy(self, pad: FallbackSinkPad, healthy: bool) -> None:
        pad.is_healthy = healthy
        pad._props["is-healthy"] = healthy
        self._try_aggregate()

    def _pick_active(self) -> Optional[FallbackSinkPad]:
        candidates = [
            p for p in self.agg_pads()
            if p.is_healthy and not p.is_inactive() and not p.timed_out  # type: ignore[attr-defined]
        ]
        if not candidates:
            return None
        if self.get_property("immediate-fallback") and self._active is None:
            # don't wait a full timeout at startup: the best input that
            # already has data wins until a higher-priority one produces
            with_data = [p for p in candidates if p.has_buffer()]
            if with_data:
                candidates = with_data
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
        # stop-on-eos: the active pad's EOS ends the stream instead of
        # falling back to a lower-priority input (fallbackswitch/imp.rs)
        if self.get_property("stop-on-eos") and self._active is not None \
                and self._active.is_inactive():
            self.srcpad.push_event(Event.new_eos())
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
        Prop("late-threshold", 2_000_000_000, type="uint64", mutable="playing",
             doc="drop input arriving later than this behind the repeated "
                 "timeline (u64 max = never drop)"),
        Prop("sync", False, type="bool", mutable="playing",
             doc="wait for each buffer's running time before forwarding "
                 "(reference defaults true; false here so non-live "
                 "pipelines free-run, matching this framework's sinks)"),
        Prop("silent", True, type="bool", mutable="playing",
             doc="suppress in/out/drop/duplicate notify signals"),
        Prop("in", 0, type="uint64", doc="(read) buffers received"),
        Prop("out", 0, type="uint64", doc="(read) buffers sent"),
        Prop("drop", 0, type="uint64", doc="(read) late buffers dropped"),
        Prop("duplicate", 0, type="uint64",
             doc="(read) repeats emitted on missed deadlines"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._last: Optional[Buffer] = None
        self._lock = threading.RLock()
        self._deadline_id = None
        self._eos = False
        self._n_in = self._n_out = self._n_drop = self._n_dup = 0

    def get_property(self, name: str):
        if name == "in":
            return self._n_in
        if name == "out":
            return self._n_out
        if name == "drop":
            return self._n_drop
        if name == "duplicate":
            return self._n_dup
        return super().get_property(name)

    def start(self) -> None:
        self._last = None
        self._eos = False
        self._n_in = self._n_out = self._n_drop = self._n_dup = 0

    # -- clocked deadline pacing (livesync/imp.rs:9-40) --------------------
    def on_paused_to_playing(self) -> None:
        self._arm_deadline()

    def on_playing_to_paused(self) -> None:
        with self._lock:
            if self._deadline_id is not None:
                self._deadline_id.unschedule()
                self._deadline_id = None

    def _period(self) -> int:
        if self._last is not None and self._last.duration:
            return self._last.duration
        return self.get_property("latency") or SECOND // 10

    def _arm_deadline(self) -> None:
        if self.clock is None:
            return
        with self._lock:
            if self._deadline_id is not None:
                self._deadline_id.unschedule()
            cid = self.clock.new_single_shot_id(self.clock.now() + self._period())
            self._deadline_id = cid
            cid.wait_async(self._on_deadline)

    def _on_deadline(self, cid) -> None:
        with self._lock:
            if cid is not self._deadline_id or cid._unscheduled:
                return
            self._deadline_id = None
            # after EOS no more buffers may flow downstream (reference
            # livesync stops and forwards EOS); don't re-arm either
            if self._eos:
                return
            if self._last is not None:
                # upstream missed its deadline: repeat the last buffer with
                # advanced timestamps to keep downstream fed
                last = self._last
                pts = None if last.pts is None else last.pts + (last.duration or 0)
                repeat = Buffer(last.data, pts=pts, duration=last.duration)
                self._last = repeat
                self._n_dup += 1
                self._n_out += 1
                self.srcpad.push(repeat)
        self._arm_deadline()

    def transform_ip(self, buf: Buffer) -> Optional[Buffer]:
        with self._lock:
            self._n_in += 1
            # late-threshold: input that fell behind the repeated timeline
            # is dropped (the repeats already covered its slot)
            thr = self.get_property("late-threshold")
            if (thr and self._last is not None and buf.pts is not None
                    and self._last.pts is not None
                    and self._last.pts - buf.pts > thr):
                self._n_drop += 1
                return None
            if self.get_property("sync") and buf.pts is not None \
                    and self.clock is not None:
                target = (self.base_time or 0) + buf.pts
                if self.clock.now() < target:
                    self.clock.new_single_shot_id(target).wait()
            self._last = buf
            self._n_out += 1
        self._arm_deadline()
        return buf

    def sink_event(self, event: Event) -> bool:
        if event.type == EventType.EOS:
            with self._lock:
                self._eos = True
                if self._deadline_id is not None:
                    self._deadline_id.unschedule()
                    self._deadline_id = None
            return True  # forward EOS
        if event.type == EventType.GAP and self._last is not None:
            # repeat the last buffer over the gap (livesync/imp.rs:9-40)
            pts = event.get("pts")
            duration = event.get("duration")
            repeat = Buffer(self._last.data, pts=pts, duration=duration)
            self.srcpad.push(repeat)
            return False  # swallow the gap event
        return True


from .togglerecord import ToggleRecord  # noqa: F401 (re-export)

__all__ = ["FallbackSwitch", "LiveSync", "ToggleRecord"]
