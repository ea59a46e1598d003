"""Remaining threadshare (ts-*) elements.

Parity target: generic/threadshare's element set (lib.rs:21-57).  The
reference's design point — many elements cooperatively scheduled on few
threads — is covered framework-wide by the synchronous scheduler plus
queue worker threads (SURVEY.md §2.3); the ts-* names here provide the
same element surface:

- ts-appsrc / ts-audiotestsrc / ts-queue — context-scheduled variants of
  the core elements (same semantics here; the scheduling substrate is
  the framework's own).
- ts-blocking-adapter — bridges a blocking upstream into a context
  (threadshare/src/blocking_adapter): a thread-decoupling stage.
- ts-clocksync — delays buffers to their running time
  (threadshare/src/clocksync).
- ts-input-selector — N sink pads, forwards the active one
  (threadshare/src/inputselector).
- ts-intersink / ts-intersrc — inter-pipeline bridge over a named
  context channel (threadshare/src/inter).
- ts-rtpdtmfsrc — RFC 4733 telephone-event RTP source
  (threadshare/src/rtpdtmfsrc).
- ts-tcpclientsrc — TCP client source (threadshare/src/tcpclientsrc).
"""
from __future__ import annotations

import socket
import struct
import time
from typing import List, Optional

import numpy as np

from ...core import (
    BaseSrc,
    Buffer,
    Caps,
    Element,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    register,
)
from ...core.parse import parse_caps
from ..sources import AppSrc, AudioTestSrc
from .basic import Queue
from .io import InterSink, InterSrc


@register
class TsAppSrc(AppSrc):
    ELEMENT_NAME = "ts-appsrc"
    ELEMENT_DESCRIPTION = "Application-driven source (threadshare analog)"


@register
class TsAudioTestSrc(AudioTestSrc):
    ELEMENT_NAME = "ts-audiotestsrc"
    ELEMENT_DESCRIPTION = "Test audio source (threadshare analog)"


@register
class TsQueue(Queue):
    ELEMENT_NAME = "ts-queue"
    ELEMENT_DESCRIPTION = "Decoupling queue (threadshare analog)"


@register
class TsBlockingAdapter(Queue):
    """Adapter that moves a blocking upstream onto its own context thread —
    the queue worker gives exactly that decoupling."""

    ELEMENT_NAME = "ts-blocking-adapter"
    ELEMENT_DESCRIPTION = "Bridges blocking upstreams into the shared context"


@register
class TsInterSink(InterSink):
    ELEMENT_NAME = "ts-intersink"
    ELEMENT_DESCRIPTION = "Inter-pipeline sink over a named context channel"


@register
class TsInterSrc(InterSrc):
    ELEMENT_NAME = "ts-intersrc"
    ELEMENT_DESCRIPTION = "Inter-pipeline source over a named context channel"


@register
class TsClockSync(Element):
    """Delays each buffer until its PTS as running time has elapsed
    (threadshare/src/clocksync; `sync=false` passes through)."""

    ELEMENT_NAME = "ts-clocksync"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Synchronizes buffers to the clock"
    PROPERTIES = [
        Prop("sync", True, type="bool"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = lambda pad, ev: self.srcpad.push_event(ev)
        self._base_time: Optional[float] = None

    def on_ready_to_paused(self) -> None:
        self._base_time = None

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if self.get_property("sync") and buf.pts is not None:
            now = time.monotonic()
            if self._base_time is None:
                self._base_time = now - buf.pts / 1e9
            target = self._base_time + buf.pts / 1e9
            delay = target - now
            if delay > 0:
                time.sleep(min(delay, 10.0))
        return self.srcpad.push(buf)


@register
class TsInputSelector(Element):
    """N request sink pads; only the active pad's buffers flow
    (threadshare/src/inputselector)."""

    ELEMENT_NAME = "ts-input-selector"
    ELEMENT_CLASS = "Generic"
    ELEMENT_DESCRIPTION = "Forwards the active input, drops the others"
    PROPERTIES = [
        Prop("active-pad", "sink_0", type="str", mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, Caps.new_any()))
        )
        self._sink_count = 0
        self._caps_pushed = False

    def request_sink_pad(self, name: Optional[str] = None) -> Pad:
        pad_name = name or f"sink_{self._sink_count}"
        self._sink_count += 1
        pad = self.add_pad(
            Pad(pad_name, PadDirection.SINK,
                PadTemplate("sink_%u", PadDirection.SINK, PadPresence.REQUEST, Caps.new_any()))
        )
        pad.chain_function = self._chain
        pad.event_function = self._event
        return pad

    def _is_active(self, pad: Pad) -> bool:
        return pad.name == self.get_property("active-pad")

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if not self._is_active(pad):
            return FlowReturn.OK
        return self.srcpad.push(buf)

    def _event(self, pad: Pad, event) -> bool:
        from ...core.events import EventType

        if self._is_active(pad) or event.type in (EventType.STREAM_START, EventType.CAPS,
                                                  EventType.SEGMENT):
            if event.type == EventType.CAPS and self._caps_pushed:
                return True
            if event.type == EventType.CAPS:
                self._caps_pushed = True
            if event.type == EventType.EOS and not self._is_active(pad):
                return True
            return self.srcpad.push_event(event)
        return True


@register
class TsRtpDtmfSrc(BaseSrc):
    """RFC 4733 telephone-event RTP source (threadshare/src/rtpdtmfsrc).

    Queue tones with `queue_dtmf(number, duration_ms)` or the `tones`
    property ("159#" etc.).  Each tone emits packets every `packet-ms`
    with accumulating duration, the final three carrying the E bit, then
    the source idles (EOS when `tones` preset is exhausted).
    """

    ELEMENT_NAME = "ts-rtpdtmfsrc"
    ELEMENT_CLASS = "Source/Network/RTP"
    ELEMENT_DESCRIPTION = "Generates RFC 4733 DTMF telephone-events as RTP"
    SRC_CAPS = Caps.builder("application/x-rtp")
    PROPERTIES = [
        Prop("pt", 101, type="uint"),
        Prop("ssrc", 0, type="uint"),
        Prop("clock-rate", 8000, type="uint"),
        Prop("tones", None, type="str", doc="tone characters 0-9 * # A-D"),
        Prop("tone-duration-ms", 160, type="uint"),
        Prop("packet-ms", 40, type="uint"),
        Prop("volume", 10, type="uint", doc="attenuation dBm0 (0-63)"),
    ]

    _CHARS = {**{str(d): d for d in range(10)}, "*": 10, "#": 11,
              "A": 12, "B": 13, "C": 14, "D": 15}

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._pending: List[int] = []
        self._seq = 0
        self._ts = 0

    def queue_dtmf(self, char: str) -> None:
        self._pending.append(self._CHARS[char.upper()])

    def start(self) -> None:
        tones = self.get_property("tones") or ""
        self._pending = [self._CHARS[c.upper()] for c in tones if c.upper() in self._CHARS]
        self._seq = 0
        self._ts = 0

    def fixate(self, caps: Caps) -> Caps:
        return parse_caps(
            f"application/x-rtp,media=audio,encoding-name=TELEPHONE-EVENT,"
            f"clock-rate={self.get_property('clock-rate')},payload={self.get_property('pt')}"
        )

    def create(self):
        if not self._pending:
            return None
        event = self._pending.pop(0)
        rate = self.get_property("clock-rate")
        tone_samples = self.get_property("tone-duration-ms") * rate // 1000
        step = self.get_property("packet-ms") * rate // 1000
        volume = self.get_property("volume") & 0x3F
        pt = self.get_property("pt")
        ssrc = self.get_property("ssrc")
        out = []
        duration = step
        first = True
        while True:
            end = duration >= tone_samples
            dur = min(duration, tone_samples)
            payload = struct.pack("!BBH", event, (0x80 if end else 0) | volume, dur)
            marker = 0x80 if first else 0
            hdr = struct.pack("!BBHII", 0x80, marker | pt, self._seq & 0xFFFF,
                              self._ts, ssrc)
            pkt = hdr + payload
            self._seq += 1
            out.append(pkt)
            first = False
            if end:
                # RFC 4733 §2.5.1.4: retransmit the end packet three times total
                for _ in range(2):
                    hdr = struct.pack("!BBHII", 0x80, pt, self._seq & 0xFFFF,
                                      self._ts, ssrc)
                    out.append(hdr + payload)
                    self._seq += 1
                break
            duration += step
        self._ts += tone_samples
        return Buffer(np.frombuffer(b"".join(
            struct.pack("!H", len(p)) + p for p in out), np.uint8))


@register
class TsTcpClientSrc(BaseSrc):
    """TCP client source (threadshare/src/tcpclientsrc)."""

    ELEMENT_NAME = "ts-tcpclientsrc"
    ELEMENT_CLASS = "Source/Network"
    ELEMENT_DESCRIPTION = "Reads a byte stream from a TCP server"
    SRC_CAPS = Caps.builder("application/octet-stream")
    PROPERTIES = [
        Prop("host", "127.0.0.1", type="str"),
        Prop("port", 4953, type="uint"),
        Prop("blocksize", 4096, type="uint"),
        Prop("caps", None, type="object"),
        Prop("timeout", 5_000_000_000, type="uint64"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None

    def start(self) -> None:
        self._sock = socket.create_connection(
            (self.get_property("host"), self.get_property("port")),
            timeout=(self.get_property("timeout") or 5e9) / 1e9,
        )

    def stop(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def fixate(self, caps: Caps) -> Caps:
        prop = self.get_property("caps")
        if prop is not None:
            return parse_caps(prop) if isinstance(prop, str) else prop
        return Caps.builder("application/octet-stream")

    def create(self):
        try:
            data = self._sock.recv(self.get_property("blocksize"))
        except socket.timeout:
            return None
        if not data:
            return None
        return Buffer(np.frombuffer(data, np.uint8))
