"""Basic plumbing elements: capsfilter, identity, queue (threaded decoupling stage)."""
from __future__ import annotations

from typing import Optional

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
    Element,
    PadDirection,
    Prop,
    TransformMode,
    register,
)


@register
class CapsFilter(BaseTransform):
    """Constrains negotiation to its `caps` property (gst capsfilter)."""

    ELEMENT_NAME = "capsfilter"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Pass data unchanged, limiting formats"
    PROPERTIES = [Prop("caps", Caps.new_any(), type="object", doc="allowed caps")]
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    FUSE_IDENTITY = True

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.intersect(self.get_property("caps"))
        if filter_ is not None:
            out = out.intersect(filter_)
        return out

    def transform_ip(self, buf: Buffer) -> Buffer:
        return buf

    def pure_kernel(self):
        """Chain-fusion hook: capsfilter moves no data — identity kernel
        lets fusable runs span the caps constraints between transforms."""
        return lambda d: d


@register
class Identity(BaseTransform):
    ELEMENT_NAME = "identity"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Pass data through unchanged"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = True
    FUSE_IDENTITY = True

    def transform_ip(self, buf: Buffer) -> Buffer:
        return buf

    def pure_kernel(self):
        return lambda d: d


@register
class Queue(Element):
    """Decoupling queue with a worker thread: upstream returns as soon as
    the item is enqueued (blocking only when full — backpressure like the
    C core), while a dedicated thread drives everything downstream.

    This is the host-side pipeline-parallelism stage (SURVEY.md §2.3 PP
    row): source/device work upstream of the queue overlaps with the
    downstream chain, the same decoupling the reference gets from the C
    core's one-thread-per-queue model and threadshare's task groups."""

    ELEMENT_NAME = "queue"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Thread-decoupling buffer queue"
    PROPERTIES = [
        Prop("max-size-buffers", 200, type="uint", minimum=1),
        Prop("max-size-time", 1_000_000_000, type="uint64"),
    ]

    _SENTINEL = object()

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        from ...core import FlowReturn, Pad, PadPresence, PadTemplate

        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._q = None
        self._thread = None
        self._downstream_flow = None
        self._error: Optional[BaseException] = None

    def on_ready_to_paused(self) -> None:
        import queue as _queue
        import threading

        self._q = _queue.Queue(maxsize=self.get_property("max-size-buffers"))
        self._downstream_flow = None
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name=f"{self.name}-worker")
        self._thread.start()

    def on_paused_to_ready(self) -> None:
        if self._thread is not None:
            self._q.put(self._SENTINEL)
            self._thread.join(timeout=30)
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def _worker(self) -> None:
        from ...core import FlowReturn

        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                return
            kind, payload = item
            try:
                if kind == "buffer":
                    ret = self.srcpad.push(payload)
                    if ret not in (FlowReturn.OK, FlowReturn.NOT_LINKED):
                        self._downstream_flow = ret
                else:
                    self.srcpad.push_event(payload)
            except BaseException as e:  # surface on the feeding thread
                self._error = e
                self._downstream_flow = FlowReturn.ERROR

    def _chain(self, pad, buf: Buffer):
        from ...core import FlowReturn

        if self._downstream_flow is not None:
            return self._downstream_flow
        if self._q is None:
            return FlowReturn.FLUSHING
        self._q.put(("buffer", buf))  # blocks when full: backpressure
        return FlowReturn.OK

    def _event(self, pad, event) -> bool:
        if self._q is None:
            return False
        self._q.put(("event", event))
        return True

    @property
    def current_level_buffers(self) -> int:
        return self._q.qsize() if self._q is not None else 0


__all__ = ["CapsFilter", "Identity", "Queue"]
