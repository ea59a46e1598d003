"""Basic plumbing elements: capsfilter, identity, queue (synchronous stand-in)."""
from __future__ import annotations

from typing import Optional

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
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

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.intersect(self.get_property("caps"))
        if filter_ is not None:
            out = out.intersect(filter_)
        return out

    def transform_ip(self, buf: Buffer) -> Buffer:
        return buf


@register
class Identity(BaseTransform):
    ELEMENT_NAME = "identity"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Pass data through unchanged"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = True

    def transform_ip(self, buf: Buffer) -> Buffer:
        return buf


@register
class Queue(BaseTransform):
    """Synchronous queue stand-in: in this cooperative single-thread scheduler
    a queue is a pass-through decoupling point (stage boundary for the
    stream-batching scheduler in `parallel/`)."""

    ELEMENT_NAME = "queue"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Buffer queue (stage boundary)"
    PROPERTIES = [
        Prop("max-size-buffers", 200, type="uint"),
        Prop("max-size-time", 1_000_000_000, type="uint64"),
    ]

    def transform_ip(self, buf: Buffer) -> Buffer:
        return buf


__all__ = ["CapsFilter", "Identity", "Queue"]
