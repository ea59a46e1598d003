"""gst_plugins_rs_tpu: a TPU-native media-effects framework.

A from-scratch rebuild of the capabilities of GStreamer/gst-plugins-rs with an
idiomatic JAX/XLA/Pallas compute path: the GStreamer element contract (caps
negotiation, properties, pads/events, BaseTransform chain semantics) is thin
host glue, while every compute-bearing inner loop runs as fused, batched
device kernels.  See SURVEY.md for the reference layer map this is built to.
"""

__version__ = "0.1.0"

from . import elements  # noqa: F401  (registers the element library)
from .core import (  # noqa: F401
    Buffer,
    BufferFlags,
    Caps,
    Element,
    Event,
    EventType,
    Fraction,
    Harness,
    Message,
    MessageType,
    Pipeline,
    Segment,
    State,
    Structure,
    element_factory_make,
    list_factories,
    parse_caps,
    parse_launch,
)
