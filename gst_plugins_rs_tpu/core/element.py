"""Element, Pad, properties and state machine.

Rebuild of the GStreamer element contract described in SURVEY.md §1:
registration metadata, pad templates with caps, GObject-style properties with
mutability rules (reference: audio/audiofx/src/audioecho/imp.rs:96-133), the
NULL/READY/PAUSED/PLAYING state machine, and push-model dataflow over linked
pads (chain / event / query functions).
"""
from __future__ import annotations

import enum
import logging
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

from .buffer import Buffer
from .caps import Caps
from .events import Event, EventType, Message, Query, QueryType

log = logging.getLogger("tpufx")


# ---------------------------------------------------------------------------
# Flow control
# ---------------------------------------------------------------------------
class FlowReturn(enum.Enum):
    OK = "ok"
    EOS = "eos"
    FLUSHING = "flushing"
    NOT_NEGOTIATED = "not-negotiated"
    ERROR = "error"
    NOT_LINKED = "not-linked"


class FlowError(Exception):
    def __init__(self, flow: FlowReturn, msg: str = ""):
        super().__init__(f"{flow.value}: {msg}")
        self.flow = flow


# ---------------------------------------------------------------------------
# Properties
# ---------------------------------------------------------------------------
@dataclass
class Prop:
    """Property spec (ParamSpec analog)."""

    name: str
    default: Any
    type: str = "float"  # float | int | uint | uint64 | bool | str | enum | bytes | object
    minimum: Any = None
    maximum: Any = None
    mutable: str = "ready"  # "ready" | "playing"
    choices: Optional[List[Any]] = None
    doc: str = ""

    def validate(self, value: Any) -> Any:
        if self.type in ("float",):
            value = float(value)
        elif self.type in ("int", "uint", "uint64"):
            value = int(value)
            if self.type.startswith("u") and value < 0:
                raise ValueError(f"{self.name}: negative value for unsigned")
        elif self.type == "bool":
            if isinstance(value, str):
                value = value.lower() in ("true", "1", "yes")
            value = bool(value)
        elif self.type == "enum":
            if self.choices and value not in self.choices:
                raise ValueError(f"{self.name}: {value!r} not in {self.choices}")
        if self.minimum is not None and value < self.minimum:
            raise ValueError(f"{self.name}: {value} < min {self.minimum}")
        if self.maximum is not None and value > self.maximum:
            raise ValueError(f"{self.name}: {value} > max {self.maximum}")
        return value


# ---------------------------------------------------------------------------
# Pads
# ---------------------------------------------------------------------------
class PadDirection(enum.Enum):
    SRC = "src"
    SINK = "sink"


class PadPresence(enum.Enum):
    ALWAYS = "always"
    SOMETIMES = "sometimes"
    REQUEST = "request"


@dataclass
class PadTemplate:
    name_template: str
    direction: PadDirection
    presence: PadPresence
    caps: Caps


class Pad:
    def __init__(self, name: str, direction: PadDirection, template: Optional[PadTemplate] = None):
        self.name = name
        self.direction = direction
        self.template = template
        self.element: Optional["Element"] = None
        self.peer: Optional["Pad"] = None
        self.current_caps: Optional[Caps] = None
        self.flushing = False
        # handler hooks (installed by the owning element, sink pads mostly)
        self.chain_function: Optional[Callable[["Pad", Buffer], FlowReturn]] = None
        self.event_function: Optional[Callable[["Pad", Event], bool]] = None
        self.query_function: Optional[Callable[["Pad", Query], bool]] = None
        # per-pad properties (GstPad-subclass ParamSpecs in the reference,
        # e.g. GstFallbackSwitchSinkPad priority/is-healthy, GstWebRTCSinkPad
        # msid, RTP base-pay pad props); installed by Element.add_pad from
        # the owner's PAD_PROPERTIES declaration
        self._props: Dict[str, Any] = {}
        self._prop_specs: Dict[str, "Prop"] = {}

    def install_properties(self, specs: List["Prop"]) -> None:
        for p in specs:
            self._prop_specs[p.name] = p
            self._props.setdefault(p.name, p.default)

    def set_property(self, name: str, value: Any) -> None:
        spec = self._prop_specs.get(name)
        if spec is None:
            raise KeyError(f"pad {self.name}: no property {name!r}")
        self._props[name] = spec.validate(value)
        if self.element is not None:
            self.element.pad_property_changed(self, name, self._props[name])

    def get_property(self, name: str) -> Any:
        if name not in self._props:
            raise KeyError(f"pad {self.name}: no property {name!r}")
        return self._props[name]

    # -- linking -------------------------------------------------------------
    def link(self, other: "Pad") -> None:
        if self.direction != PadDirection.SRC or other.direction != PadDirection.SINK:
            raise ValueError("link must go src -> sink")
        if self.peer is not None or other.peer is not None:
            raise ValueError(f"pad already linked: {self} / {other}")
        if not self.pad_template_caps().can_intersect(other.pad_template_caps()):
            raise ValueError(
                f"cannot link {self.element and self.element.name}:{self.name} -> "
                f"{other.element and other.element.name}:{other.name}: caps do not intersect"
            )
        self.peer = other
        other.peer = self

    def unlink(self) -> None:
        if self.peer is not None:
            self.peer.peer = None
            self.peer = None

    def pad_template_caps(self) -> Caps:
        return self.template.caps if self.template else Caps.new_any()

    # -- dataflow --------------------------------------------------------------
    def push(self, buffer: Buffer) -> FlowReturn:
        """Push a buffer from this SRC pad to the linked sink pad."""
        assert self.direction == PadDirection.SRC
        if self.peer is None:
            return FlowReturn.NOT_LINKED
        return self.peer.chain(buffer)

    def chain(self, buffer: Buffer) -> FlowReturn:
        assert self.direction == PadDirection.SINK
        if self.flushing:
            return FlowReturn.FLUSHING
        if self.chain_function is None:
            raise RuntimeError(f"sink pad {self} has no chain function")
        if self.element is not None:
            self.element._trace_buffer(self, buffer)
        try:
            return self.chain_function(self, buffer)
        except FlowError as e:
            return e.flow

    def push_event(self, event: Event) -> bool:
        """Send an event to the peer (downstream from SRC, upstream from SINK)."""
        if self.peer is None:
            return False
        return self.peer.send_event(event)

    def send_event(self, event: Event) -> bool:
        if event.type == EventType.FLUSH_START:
            self.flushing = True
        elif event.type == EventType.FLUSH_STOP:
            self.flushing = False
        if event.type == EventType.CAPS:
            self.current_caps = event.get("caps")
        if self.event_function is not None:
            return self.event_function(self, event)
        # default: element forwards the event out the other side
        if self.element is not None:
            return self.element._default_event(self, event)
        return True

    # -- queries ---------------------------------------------------------------
    def query(self, query: Query) -> bool:
        if self.query_function is not None:
            return self.query_function(self, query)
        if self.element is not None:
            return self.element._default_query(self, query)
        return False

    def peer_query(self, query: Query) -> bool:
        if self.peer is None:
            return False
        return self.peer.query(query)

    def query_caps(self, filter_: Optional[Caps] = None) -> Caps:
        q = Query.new_caps(filter_)
        if self.query(q):
            caps = q.result.get("caps", Caps.new_any())
        else:
            caps = self.pad_template_caps()
        if filter_ is not None:
            caps = filter_.intersect(caps)
        return caps

    def peer_query_caps(self, filter_: Optional[Caps] = None) -> Caps:
        if self.peer is None:
            return filter_.copy() if filter_ is not None else Caps.new_any()
        return self.peer.query_caps(filter_)

    def __repr__(self):
        owner = self.element.name if self.element else "?"
        return f"Pad({owner}:{self.name})"


# ---------------------------------------------------------------------------
# State machine
# ---------------------------------------------------------------------------
class State(enum.IntEnum):
    NULL = 0
    READY = 1
    PAUSED = 2
    PLAYING = 3


class Element:
    """Base element. Subclasses declare ELEMENT_NAME / PROPERTIES / pad
    templates and implement dataflow hooks."""

    ELEMENT_NAME: str = ""
    ELEMENT_CLASS: str = "Generic"
    ELEMENT_DESCRIPTION: str = ""
    PROPERTIES: List[Prop] = []
    #: GObject-signal analog: action signals map to a method name that
    #: `emit()` dispatches to; request signals (value None) are answered
    #: by a `connect()`ed handler and emit() returns its result.
    SIGNALS: Dict[str, Optional[str]] = {}
    #: Introspection metadata for pads that only exist after a request or
    #: a stream appears: (name_template, direction, presence, caps_name).
    #: request_sink_pad()/dataflow create the real Pad objects; this list
    #: makes them visible to --inspect and the registry like the
    #: reference's static pad templates.
    EXTRA_PAD_TEMPLATES: List[tuple] = []
    #: Per-pad property specs, keyed by normalized pad-template name (the
    #: template name up to the first %-pattern/digit, trailing _ removed:
    #: "sink_%u" -> "sink").  The reference declares these on GstPad
    #: subclasses (GstFallbackSwitchSinkPad, GstWebRTCSinkPad, RTP
    #: base-pay pads, ...); here they are installed on every Pad added
    #: whose template matches the key.
    PAD_PROPERTIES: Dict[str, List[Prop]] = {}
    #: Property surfaces of GObject-like objects this element hands out
    #: through signals/properties (the reference's `other-types` objects:
    #: GstRtp2Session from get-session, GstWebRTCSession from the session
    #: accessor, ...), keyed by the reference type name.  Introspected into
    #: docs/elements.json as "object-properties" and audited by
    #: ci/prop_parity.py OBJECT_TYPES.
    OBJECT_PROPERTIES: Dict[str, List[Prop]] = {}

    _instance_counter: Dict[str, int] = {}

    def __init__(self, name: Optional[str] = None):
        cls = type(self)
        if name is None:
            n = Element._instance_counter.get(cls.ELEMENT_NAME, 0)
            Element._instance_counter[cls.ELEMENT_NAME] = n + 1
            name = f"{cls.ELEMENT_NAME}{n}"
        self.name = name
        self.state = State.NULL
        self.parent: Optional[Any] = None  # Pipeline/Bin
        # pipeline clock, distributed on PAUSED->PLAYING (core/clock.py);
        # None in clockless (fully synchronous) pipelines/harnesses
        self.clock: Optional[Any] = None
        self.base_time: int = 0
        self.pads: Dict[str, Pad] = {}
        self._props: Dict[str, Any] = {}
        self._prop_specs: Dict[str, Prop] = {}
        for p in self._all_props():
            self._prop_specs[p.name] = p
            self._props[p.name] = p.default

    @classmethod
    def _all_props(cls) -> List[Prop]:
        seen: Dict[str, Prop] = {}
        for klass in reversed(cls.__mro__):
            for p in vars(klass).get("PROPERTIES", []):
                seen[p.name] = p
        return list(seen.values())

    # -- signals (GObject action/request signal analog) ----------------------
    @classmethod
    def _all_signals(cls) -> Dict[str, Optional[str]]:
        seen: Dict[str, Optional[str]] = {}
        for klass in reversed(cls.__mro__):
            seen.update(vars(klass).get("SIGNALS", {}))
        return seen

    def emit(self, signal: str, *args, **kwargs):
        """`element.emit("signal-name", ...)` like gst_signal_emit: action
        signals call the mapped method; request signals call the connected
        handler (first one wins) and return its result."""
        signals = self._all_signals()
        if signal not in signals:
            raise KeyError(f"{self.ELEMENT_NAME}: no signal {signal!r}")
        method = signals[signal]
        if method is not None:
            return getattr(self, method)(*args, **kwargs)
        for cb in getattr(self, "_signal_handlers", {}).get(signal, []):
            return cb(self, *args, **kwargs)
        return None

    def connect(self, signal: str, callback) -> None:
        """Attach a handler for a request signal (or to observe an action
        signal's emissions is not supported — actions dispatch to methods)."""
        if signal not in self._all_signals():
            raise KeyError(f"{self.ELEMENT_NAME}: no signal {signal!r}")
        if not hasattr(self, "_signal_handlers"):
            self._signal_handlers: Dict[str, List[Any]] = {}
        self._signal_handlers.setdefault(signal, []).append(callback)

    def signal_handler(self, signal: str):
        """First connected handler for `signal`, or None."""
        handlers = getattr(self, "_signal_handlers", {}).get(signal)
        return handlers[0] if handlers else None

    @classmethod
    def _all_pad_properties(cls) -> Dict[str, List[Prop]]:
        seen: Dict[str, Dict[str, Prop]] = {}
        for klass in reversed(cls.__mro__):
            for tmpl, props in vars(klass).get("PAD_PROPERTIES", {}).items():
                bucket = seen.setdefault(tmpl, {})
                for p in props:
                    bucket[p.name] = p
        return {tmpl: list(d.values()) for tmpl, d in seen.items()}

    @classmethod
    def _all_object_properties(cls) -> Dict[str, List[Prop]]:
        seen: Dict[str, Dict[str, Prop]] = {}
        for klass in reversed(cls.__mro__):
            for tname, props in vars(klass).get("OBJECT_PROPERTIES", {}).items():
                bucket = seen.setdefault(tname, {})
                for p in props:
                    bucket[p.name] = p
        return {t: list(d.values()) for t, d in seen.items()}

    @staticmethod
    def _norm_pad_name(name: str) -> str:
        out = []
        for ch in name:
            if ch == "%" or ch.isdigit():
                break
            out.append(ch)
        return "".join(out).rstrip("_")

    # -- pads -------------------------------------------------------------------
    def add_pad(self, pad: Pad) -> Pad:
        pad.element = self
        self.pads[pad.name] = pad
        pad_props = self._all_pad_properties()
        if pad_props:
            tmpl = pad.template.name_template if pad.template else pad.name
            specs = pad_props.get(self._norm_pad_name(tmpl))
            if specs:
                pad.install_properties(specs)
        return pad

    def pad_property_changed(self, pad: Pad, name: str, value: Any) -> None:
        """Hook: called after a per-pad property is set."""

    def pad(self, name: str) -> Pad:
        return self.pads[name]

    def src_pads(self) -> List[Pad]:
        return [p for p in self.pads.values() if p.direction == PadDirection.SRC]

    def sink_pads(self) -> List[Pad]:
        return [p for p in self.pads.values() if p.direction == PadDirection.SINK]

    def static_pad(self, name: str) -> Optional[Pad]:
        return self.pads.get(name)

    def request_pad(self, template_name: str) -> Pad:
        raise NotImplementedError(f"{self.ELEMENT_NAME} has no request pads")

    def link(self, downstream: "Element") -> None:
        """Link this element's first unlinked src pad to `downstream`'s first
        unlinked sink pad (gst `!` semantics)."""
        src = next((p for p in self.src_pads() if p.peer is None), None)
        if src is None and hasattr(self, "request_src_pad"):
            src = self.request_src_pad()  # type: ignore[attr-defined]
        sink = next((p for p in downstream.sink_pads() if p.peer is None), None)
        if sink is None and hasattr(downstream, "request_sink_pad"):
            sink = downstream.request_sink_pad()  # type: ignore[attr-defined]
        if src is None or sink is None:
            raise ValueError(f"cannot link {self.name} ! {downstream.name}: no free pads")
        src.link(sink)

    # -- properties ----------------------------------------------------------------
    def set_property(self, name: str, value: Any) -> None:
        spec = self._prop_specs.get(name)
        if spec is None:
            raise KeyError(f"{self.ELEMENT_NAME}: no property {name!r}")
        if spec.mutable == "ready" and self.state > State.READY:
            raise RuntimeError(f"{self.ELEMENT_NAME}.{name} is only mutable in READY or below")
        self._props[name] = spec.validate(value)
        self.property_changed(name, self._props[name])

    def get_property(self, name: str) -> Any:
        if name not in self._props:
            raise KeyError(f"{self.ELEMENT_NAME}: no property {name!r}")
        return self._props[name]

    def property_changed(self, name: str, value: Any) -> None:
        """Hook: called after a property is set."""

    # -- state ---------------------------------------------------------------------
    def set_state(self, target: State) -> None:
        while self.state != target:
            up = target > self.state
            nxt = State(self.state + (1 if up else -1))
            self._transition(self.state, nxt)
            self.state = nxt

    def _transition(self, old: State, new: State) -> None:
        if (old, new) == (State.NULL, State.READY):
            self.on_null_to_ready()
        elif (old, new) == (State.READY, State.PAUSED):
            self.on_ready_to_paused()
        elif (old, new) == (State.PAUSED, State.PLAYING):
            self.on_paused_to_playing()
        elif (old, new) == (State.PLAYING, State.PAUSED):
            self.on_playing_to_paused()
        elif (old, new) == (State.PAUSED, State.READY):
            self.on_paused_to_ready()
            for pad in self.pads.values():
                pad.current_caps = None
        elif (old, new) == (State.READY, State.NULL):
            self.on_ready_to_null()

    # state hooks (reference: lifecycle drops internal state,
    # audio/audiofx/src/audioloudnorm/imp.rs:1874-1890)
    def on_null_to_ready(self) -> None: ...
    def on_ready_to_paused(self) -> None: ...
    def on_paused_to_playing(self) -> None: ...
    def on_playing_to_paused(self) -> None: ...
    def on_paused_to_ready(self) -> None: ...
    def on_ready_to_null(self) -> None: ...

    # -- clock -----------------------------------------------------------------------
    def running_time(self) -> Optional[int]:
        """Clock time minus base time (ns), None without a clock."""
        if self.clock is None:
            return None
        return self.clock.now() - self.base_time

    # -- messages -------------------------------------------------------------------
    def post_message(self, message: Message) -> None:
        message.src = self
        node = self.parent
        while node is not None and not hasattr(node, "bus"):
            node = getattr(node, "parent", None)
        if node is not None:
            node.bus.post(message)
        else:
            log.debug("dropped message (no bus): %r", message)

    # -- default event/query behaviour -------------------------------------------------
    def _default_event(self, pad: Pad, event: Event) -> bool:
        """Forward serialized events downstream / upstream events upstream."""
        if pad.direction == PadDirection.SINK:
            ok = True
            for src in self.src_pads():
                ok = src.push_event(event) and ok
            return ok
        else:
            ok = True
            for sink in self.sink_pads():
                ok = sink.push_event(event) and ok
            return ok

    def _default_query(self, pad: Pad, query: Query) -> bool:
        if query.type == QueryType.CAPS:
            # default: proxy through to the other side, constrained by template
            tmpl = pad.pad_template_caps()
            others = self.src_pads() if pad.direction == PadDirection.SINK else self.sink_pads()
            if others and others[0].peer is not None:
                downstream = others[0].peer_query_caps(tmpl)
                query.result["caps"] = downstream
            else:
                query.result["caps"] = tmpl
            return True
        if query.type == QueryType.LATENCY:
            # forward upstream through sink pads
            sinks = self.sink_pads()
            if sinks and sinks[0].peer is not None:
                return sinks[0].peer_query(query)
            query.result.setdefault("live", False)
            query.result.setdefault("min_latency", 0)
            return True
        return False

    # -- tracing hook (utils.tracers) ----------------------------------------------------
    def _trace_buffer(self, pad: Pad, buffer: Buffer) -> None:
        node = self.parent
        while node is not None and not hasattr(node, "tracers"):
            node = getattr(node, "parent", None)
        if node is not None:
            for tracer in node.tracers:
                tracer.on_buffer(self, pad, buffer)

    def __repr__(self):
        return f"<{type(self).__name__} {self.name} [{self.state.name}]>"


__all__ = [
    "Element",
    "Pad",
    "PadTemplate",
    "PadDirection",
    "PadPresence",
    "Prop",
    "State",
    "FlowReturn",
    "FlowError",
]
