"""Core runtime: buffers, caps, events, pads, elements, pipeline, harness."""
from .adapter import Adapter
from .aggregator import Aggregator, AggregatorPad
from .audio import AudioInfo, AudioLayout, ChannelPosition, audio_caps_template
from .basesrc import BaseSink, BaseSrc
from .basetransform import AudioFilter, BaseTransform, TransformMode, VideoFilter
from .buffer import (
    CLOCK_TIME_NONE,
    MSECOND,
    NSECOND,
    SECOND,
    USECOND,
    Buffer,
    BufferFlags,
    Meta,
)
from .bus import Bus
from .caps import Caps, Fraction, IntRange, Structure, ValueList
from .clock import Clock, ClockId, ClockReturn, SystemClock, TestClock
from .element import (
    Element,
    FlowError,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    State,
)
from .events import (
    Event,
    EventType,
    Message,
    MessageType,
    Query,
    QueryType,
    Segment,
    SegmentFlags,
)
from .harness import Harness
from .parse import parse_caps, parse_launch, parse_value
from .pipeline import Pipeline
from .registry import (
    element_factory_make,
    factory_class,
    factory_exists,
    list_factories,
    register,
)
from .video import VideoCaptionMeta, VideoInfo, video_caps_template

__all__ = [
    "Adapter",
    "Aggregator",
    "AggregatorPad",
    "AudioFilter",
    "AudioInfo",
    "AudioLayout",
    "BaseSink",
    "BaseSrc",
    "BaseTransform",
    "Buffer",
    "BufferFlags",
    "Bus",
    "Caps",
    "ChannelPosition",
    "CLOCK_TIME_NONE",
    "Element",
    "Event",
    "EventType",
    "FlowError",
    "FlowReturn",
    "Fraction",
    "Harness",
    "IntRange",
    "Message",
    "MessageType",
    "Meta",
    "MSECOND",
    "NSECOND",
    "Pad",
    "PadDirection",
    "PadPresence",
    "PadTemplate",
    "Pipeline",
    "Prop",
    "Query",
    "QueryType",
    "SECOND",
    "Segment",
    "SegmentFlags",
    "State",
    "Structure",
    "TransformMode",
    "USECOND",
    "ValueList",
    "VideoFilter",
    "VideoInfo",
    "audio_caps_template",
    "element_factory_make",
    "factory_class",
    "factory_exists",
    "list_factories",
    "parse_caps",
    "parse_launch",
    "parse_value",
    "register",
    "video_caps_template",
    "VideoCaptionMeta",
]
