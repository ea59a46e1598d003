"""analyticscombiner / analyticssplitter: N-stream batcher / debatcher.

Parity target: analytics/analytics/src/combiner/imp.rs (1108 LoC) +
splitter/imp.rs (441): the combiner aggregates buffers from all sink pads
into `multistream/x-analytics-batch` buffers over `batch-duration` (default
100 ms) windows with a per-pad `batch-strategy` (all / first-in-batch /
last-in-batch / first-in-batch-with-overlap); the splitter demuxes the batch
back into per-stream src pads.  This is the reference's mechanism for
amortizing inference across streams (SURVEY.md §2.3) — here it feeds the
device-side stream batching of parallel/streams.py.
"""
from __future__ import annotations

from typing import Dict, List, Optional

from ...core import (
    Buffer,
    Caps,
    Element,
    Event,
    EventType,
    FlowReturn,
    Meta,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    SECOND,
    Segment,
    register,
)
from ...core.aggregator import Aggregator, AggregatorPad

BATCH_CAPS = Caps.builder("multistream/x-analytics-batch")

STRATEGIES = ["all", "first-in-batch", "last-in-batch", "first-in-batch-with-overlap"]


class BatchStreamEntry:
    """One stream's contribution to a batch window."""

    __slots__ = ("index", "caps", "buffers")

    def __init__(self, index: int, caps: Optional[Caps], buffers: List[Buffer]):
        self.index = index
        self.caps = caps
        self.buffers = buffers

    def __repr__(self):
        return f"BatchStreamEntry(index={self.index}, n={len(self.buffers)})"


class BatchMeta(Meta):
    """gst_analytics::AnalyticsBatchMeta analog."""

    api = "analytics-batch"

    def __init__(self, streams: List[BatchStreamEntry]):
        self.streams = streams

    def __repr__(self):
        return f"BatchMeta({self.streams})"


class CombinerSinkPad(AggregatorPad):
    def __init__(self, name: str, template: PadTemplate, index: int):
        super().__init__(name, template)
        self.index = index
        self.batch_strategy = "all"
        self.overlap_carry: Optional[Buffer] = None


@register
class AnalyticsCombiner(Aggregator):
    ELEMENT_NAME = "analyticscombiner"
    ELEMENT_CLASS = "Combiner/Analytics"
    ELEMENT_DESCRIPTION = "Batches buffers from multiple streams for analytics processing"
    SRC_TEMPLATE_CAPS = BATCH_CAPS
    PROPERTIES = [
        Prop("batch-duration", 100 * SECOND // 1000, type="uint64", mutable="ready"),
        Prop("force-live", False, type="bool", mutable="ready"),
    ]
    # GstAnalyticsCombinerSinkPad surface (reference rsanalytics other-types)
    PAD_PROPERTIES = {
        "sink": [
            Prop("batch-strategy", "all", type="enum", choices=STRATEGIES,
                 mutable="ready",
                 doc="which of the window's buffers this stream contributes"),
            Prop("index", 0, type="uint", mutable="ready",
                 doc="stream index inside the batch (defaults to request "
                     "order)"),
        ],
    }

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._window_start = 0
        self._sent_caps = False

    def request_sink_pad(self, name: Optional[str] = None) -> CombinerSinkPad:
        idx = self._pad_counter
        if name is None:
            name = f"sink_{idx}"
        self._pad_counter += 1
        pad = CombinerSinkPad(name, self._sink_template, idx)
        pad.chain_function = self._sink_chain
        pad.event_function = self._sink_event
        pad.query_function = self._sink_query
        self.add_pad(pad)
        pad._props["index"] = idx  # default = request order
        return pad

    def pad_property_changed(self, pad, name: str, value) -> None:
        if name == "batch-strategy":
            pad.batch_strategy = value
        elif name == "index":
            pad.index = value

    def set_pad_strategy(self, pad: CombinerSinkPad, strategy: str) -> None:
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown batch strategy {strategy!r}")
        pad.batch_strategy = strategy
        pad._props["batch-strategy"] = strategy

    # ------------------------------------------------------------------
    def _window_complete(self, pad: CombinerSinkPad, end: int) -> bool:
        """A pad's window contribution is complete when EOS or a queued
        buffer starts at/after the window end."""
        if pad.eos:
            return True
        for buf in pad.queue:
            if buf.pts is not None and buf.pts >= end:
                return True
        return False

    def aggregate(self, timeout: bool) -> FlowReturn:
        duration = self.get_property("batch-duration")
        pads = [p for p in self.agg_pads()]
        end = self._window_start + duration
        if not all(self._window_complete(p, end) for p in pads if not p.is_inactive()):
            return FlowReturn.OK  # need more data for this window

        entries = []
        for pad in sorted(pads, key=lambda p: p.index):  # type: ignore[attr-defined]
            bufs: List[Buffer] = []
            if pad.overlap_carry is not None:
                bufs.append(pad.overlap_carry)
                pad.overlap_carry = None
            while pad.queue and (
                pad.queue[0].pts is None or pad.queue[0].pts < end
            ):
                bufs.append(pad.pop_buffer())
            strategy = pad.batch_strategy
            if strategy == "first-in-batch" and len(bufs) > 1:
                bufs = bufs[:1]
            elif strategy == "last-in-batch" and len(bufs) > 1:
                bufs = bufs[-1:]
            elif strategy == "first-in-batch-with-overlap" and bufs:
                # buffer closest to the window start; keep the last one
                # around for the next window (combiner/imp.rs:712-770)
                best = min(
                    bufs,
                    key=lambda b: abs((b.pts if b.pts is not None else self._window_start) - self._window_start),
                )
                if bufs[-1] is not best and bufs[-1].pts is not None and bufs[-1].pts >= end - duration // 2:
                    pad.overlap_carry = bufs[-1]
                bufs = [best]
            entries.append(BatchStreamEntry(pad.index, pad.current_caps, bufs))

        if not self._sent_caps:
            self.srcpad.current_caps = BATCH_CAPS
            self.srcpad.push_event(Event.new_caps(BATCH_CAPS))
            self.srcpad.push_event(Event.new_segment(Segment()))
            self._sent_caps = True

        out = Buffer(None, pts=self._window_start, duration=duration)
        out.add_meta(BatchMeta(entries))
        self._window_start = end
        return self.finish_buffer(out)

    def _try_aggregate(self) -> FlowReturn:
        # override: windows complete on pts boundaries, not queue fullness
        ret = FlowReturn.OK
        while True:
            pads = self.agg_pads()
            active = [p for p in pads if not p.is_inactive()]
            duration = self.get_property("batch-duration")
            end = self._window_start + duration
            if pads and active and all(self._window_complete(p, end) for p in active):
                ret = self.aggregate(timeout=False)
                if ret != FlowReturn.OK:
                    return ret
                continue
            if pads and not active:
                # drain any remaining partial window
                if any(p.queue for p in pads) or any(p.overlap_carry for p in pads):
                    ret = self.aggregate(timeout=True)
                self.srcpad.push_event(Event.new_eos())
            return ret


@register
class AnalyticsSplitter(Element):
    ELEMENT_NAME = "analyticssplitter"
    EXTRA_PAD_TEMPLATES = [
        ('src_%u', 'src', 'sometimes', 'ANY'),
    ]
    ELEMENT_CLASS = "Demuxer/Analytics"
    ELEMENT_DESCRIPTION = "Splits analytics batch buffers back into per-stream pads"

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK, PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, BATCH_CAPS))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._src_pads: Dict[int, Pad] = {}
        self._started: Dict[int, bool] = {}

    def _get_src(self, index: int) -> Pad:
        if index not in self._src_pads:
            pad = Pad(
                f"src_{index}",
                PadDirection.SRC,
                PadTemplate("src_%u", PadDirection.SRC, PadPresence.SOMETIMES, Caps.new_any()),
            )
            self.add_pad(pad)
            self._src_pads[index] = pad
            self._started[index] = False
        return self._src_pads[index]

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        meta = buf.get_meta(BatchMeta)
        if meta is None:
            return FlowReturn.ERROR
        ret = FlowReturn.OK
        for entry in meta.streams:
            src = self._get_src(entry.index)
            if src.peer is None:
                continue
            if not self._started[entry.index]:
                src.push_event(Event.new_stream_start(f"{self.name}-src_{entry.index}"))
                if entry.caps is not None:
                    src.current_caps = entry.caps
                    src.push_event(Event.new_caps(entry.caps))
                src.push_event(Event.new_segment(Segment()))
                self._started[entry.index] = True
            for b in entry.buffers:
                r = src.push(b)
                if r != FlowReturn.OK:
                    ret = r
        return ret

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type in (EventType.EOS, EventType.FLUSH_START, EventType.FLUSH_STOP):
            ok = True
            for src in self._src_pads.values():
                ok = src.push_event(event) and ok
            return ok
        return True


__all__ = ["AnalyticsCombiner", "AnalyticsSplitter", "BatchMeta", "BatchStreamEntry", "STRATEGIES"]
