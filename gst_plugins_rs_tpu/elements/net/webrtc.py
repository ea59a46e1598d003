"""webrtcsink / webrtcsrc — WebRTC producer and consumer elements.

Parity targets: net/webrtc/src/webrtcsink/imp.rs and webrtcsrc/imp.rs.
The signalling protocol (net/webrtc_signalling.py) matches the reference's
gst-webrtc-signalling-server JSON wire format; the media leg is the
in-repo ICE (RFC 8445) + DTLS 1.2 (RFC 6347) + SRTP (RFC 3711) stack —
real encrypted WebRTC, not plain RTP.

Like the reference, webrtcsink consumes either raw media (video/x-raw
I420 -> internal rav1enc + rtpav1pay2 chain; audio/x-raw -> rtpL16pay2)
or pre-payloaded `application/x-rtp`.  Each consumer session gets its
own PeerConnection; the producer re-sends the one encoded stream to all
connected sessions (the reference shares one encoded stream the same
way).  Divergence (documented): no congestion-control loop on the
encoder (the reference drives encoder bitrate from rtpgccbwe feedback).

webrtcsrc emits `application/x-rtp` buffers with media/encoding-name/
clock-rate/payload taken from the producer's SDP offer.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from ...core import (
    BaseSink,
    BaseSrc,
    Buffer,
    Caps,
    FlowReturn,
    Message,
    MessageType,
    Prop,
    register,
)
from ...net.webrtc_peer import PeerConnection, WebRtcError
from ...net.webrtc_signalling import (
    SignallingClient,
    msg_end_session,
    msg_peer_sdp,
)

RTP_CAPS = Caps.builder("application/x-rtp")


def _caps_media(caps: Optional[Caps]):
    """(media, pt, encoding-name, clock-rate) from x-rtp caps, with defaults."""
    s = caps.structure(0) if caps is not None and caps.structures else None
    get = (lambda k, d: s.get(k, d)) if s is not None else (lambda k, d: d)
    return (
        get("media", "video"),
        int(get("payload", 96)),
        get("encoding-name", "VP8"),
        int(get("clock-rate", 90000)),
    )


@register
class WebRtcSink(BaseSink):
    ELEMENT_NAME = "webrtcsink"
    EXTRA_PAD_TEMPLATES = [
        ('video_%u', 'sink', 'request', 'video/x-raw'),
        ('audio_%u', 'sink', 'request', 'audio/x-raw'),
    ]
    ELEMENT_CLASS = "Sink/Network/WebRTC"
    ELEMENT_DESCRIPTION = "WebRTC producer with gst-webrtc signalling (ICE+DTLS-SRTP)"
    from ...core.caps import Structure as _S
    SINK_CAPS = Caps([
        _S("application/x-rtp"),
        _S("video/x-raw", format="I420"),
        _S("audio/x-raw"),
    ])
    PROPERTIES = [
        Prop("signaller-uri", "ws://127.0.0.1:8443", type="str"),
        Prop("meta", None, type="object", doc="JSON metadata advertised with the producer"),
        Prop("stun-server", None, type="str", doc="accepted for API parity; host candidates only"),
        # congestion control (webrtcsink/imp.rs:69-84 defaults; the
        # reference's homegrown_cc loss-driven controller — full GCC needs
        # TWCC extension negotiation, documented divergence)
        Prop("congestion-control", "homegrown", type="enum",
             choices=["disabled", "homegrown"], mutable="ready"),
        Prop("min-bitrate", 1000, type="uint", doc="bps"),
        Prop("max-bitrate", 8_192_000, type="uint", doc="bps"),
        Prop("start-bitrate", 2_048_000, type="uint", doc="bps"),
        # embedded signalling server (webrtcsink/imp.rs run-signalling-server)
        Prop("run-signalling-server", False, type="bool",
             doc="start the in-repo gst-webrtc signalling relay and "
                 "connect to it instead of signaller-uri"),
        Prop("signalling-server-host", "0.0.0.0", type="str"),
        Prop("signalling-server-port", 8443, type="uint", maximum=65535),
        Prop("signalling-server-cert", None, type="str",
             doc="TLS cert for the embedded server (accepted; the in-repo "
                 "relay serves plain ws — wss termination is external)"),
        Prop("signalling-server-cert-password", None, type="str",
             doc="accepted with signalling-server-cert"),
        Prop("signalling-server-key", None, type="str",
             doc="accepted with signalling-server-cert"),
        Prop("signalling-server-headers", None, type="object",
             doc="extra headers the embedded server replies with "
                 "(accepted; the relay speaks the JSON protocol only)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[SignallingClient] = None
        self._own_server = None
        self._sessions: Dict[str, PeerConnection] = {}
        self._lock = threading.RLock()
        self._chain_elements = []
        self._chain_head = None
        self._rtp_media = None  # (media, pt, encoding, rate) for offers
        self._extra_pads = []  # request pads -> extra BUNDLE sections
        self._cc_encoder = None
        self._cc_bitrate = 0
        self._cc_last_update = 0.0

    # -- loss-driven congestion control (homegrown_cc analog) -----------------
    def _on_rtcp(self, data: bytes) -> None:
        if self.get_property("congestion-control") == "disabled":
            return
        from ...net import rtcp as _rtcp

        try:
            pkts = _rtcp.parse_compound(data)
        except Exception:
            return
        for pkt in pkts:
            if isinstance(pkt, _rtcp.ReceiverReport) and pkt.reports:
                self._cc_update(max(rb.fraction_lost for rb in pkt.reports))

    def _cc_update(self, fraction_lost: int) -> None:
        import time as _t

        now = _t.monotonic()
        if now - self._cc_last_update < 0.5:  # rate-limit reconfigs
            return
        self._cc_last_update = now
        if not self._cc_bitrate:
            self._cc_bitrate = self.get_property("start-bitrate")
        loss = fraction_lost / 256.0
        if loss > 0.10:
            # multiplicative decrease proportional to loss (homegrown_cc)
            self._cc_bitrate = int(self._cc_bitrate * (1.0 - 0.5 * loss))
        elif loss < 0.02:
            self._cc_bitrate = int(self._cc_bitrate * 1.05)
        self._cc_bitrate = max(self.get_property("min-bitrate"),
                               min(self.get_property("max-bitrate"),
                                   self._cc_bitrate))
        enc = self._cc_encoder
        if enc is not None and enc.get_property("bitrate") != self._cc_bitrate:
            enc.set_property("bitrate", self._cc_bitrate)
        from ...core.caps import Structure
        from ...core.events import Message, MessageType

        self.post_message(Message(
            MessageType.ELEMENT,
            structure=Structure("webrtcsink-congestion",
                                bitrate=self._cc_bitrate,
                                fraction_lost=fraction_lost)))

    # -- internal encode chain for raw media (webrtcsink/imp.rs encoder role)
    def on_caps(self, caps: Caps) -> None:
        s = caps.structure(0)
        if s.name == "application/x-rtp":
            self._rtp_media = (
                s.get("media", "video"), int(s.get("payload", 96)),
                s.get("encoding-name", "VP8"), int(s.get("clock-rate", 90000)),
            )
            return
        from ...core.registry import element_factory_make
        from ...core.element import Pad, PadDirection, PadPresence, PadTemplate, State
        from ...core.events import Event, Segment

        if s.name == "video/x-raw":
            enc = element_factory_make("rav1enc", f"{self.name}-enc")
            enc.set_property("low-latency", True)
            enc.set_property("speed-preset", 10)
            if self.get_property("congestion-control") != "disabled":
                enc.set_property("bitrate", self.get_property("start-bitrate"))
                self._cc_encoder = enc
            pay = element_factory_make("rtpav1pay2", f"{self.name}-pay")
            chain = [enc, pay]
            self._rtp_media = ("video", 96, "AV1", 90000)
        else:
            pay = element_factory_make("rtpL16pay2", f"{self.name}-pay")
            chain = [pay]
            self._rtp_media = ("audio", 96, "L16", int(s.get("rate", 48000)))
        for k in ("ssrc", "seqnum-offset", "timestamp-offset"):
            try:
                pay.set_property(k, 0 if k != "ssrc" else 1)
            except Exception:
                pass
        for a, b in zip(chain, chain[1:]):
            a.link(b)
        terminal = Pad(f"{self.name}-rtp-out", PadDirection.SINK,
                       PadTemplate("inner", PadDirection.SINK, PadPresence.ALWAYS,
                                   Caps.new_any()))
        terminal.element = self
        terminal.chain_function = lambda pad, buf: self._send_rtp_buffer(buf)
        terminal.event_function = lambda pad, ev: True
        tail_src = chain[-1].src_pads()[0]
        tail_src.peer = terminal
        terminal.peer = tail_src
        for e in chain:
            e.set_state(State.PLAYING)
        head = chain[0].sink_pads()[0]
        head.send_event(Event.new_stream_start(f"{self.name}-raw"))
        head.send_event(Event.new_caps(caps))
        head.send_event(Event.new_segment(Segment()))
        self._chain_elements = chain
        self._chain_head = head

    def _send_rtp_buffer(self, buffer: Buffer) -> FlowReturn:
        data = np.asarray(buffer.data, dtype=np.uint8).tobytes()
        with self._lock:
            sessions = list(self._sessions.values())
        for pc in sessions:
            pc.send_rtp(data)
        return FlowReturn.OK

    # -- extra media sections (request pads, webrtcsink video_%u/audio_%u) ----
    def request_sink_pad(self, kind: str = "video") -> "Pad":
        """Adds another application/x-rtp stream as its own BUNDLEd m-line;
        the pad's caps become the section's rtpmap."""
        from ...core.element import Pad, PadDirection, PadPresence, PadTemplate

        idx = len(self._extra_pads)
        pad = Pad(f"{kind}_{idx}", PadDirection.SINK,
                  PadTemplate(f"{kind}_%u", PadDirection.SINK, PadPresence.REQUEST,
                              RTP_CAPS))
        self.add_pad(pad)
        entry = {"pad": pad, "media": None}
        self._extra_pads.append(entry)

        def on_event(p, ev, entry=entry):
            from ...core.events import EventType

            if ev.type == EventType.CAPS:
                st = ev.get("caps").structure(0)
                entry["media"] = (
                    st.get("media", kind), int(st.get("payload", 97 + idx)),
                    st.get("encoding-name", "VP8"), int(st.get("clock-rate", 90000)),
                )
            return True

        pad.chain_function = lambda p, buf: self._send_rtp_buffer(buf)
        pad.event_function = on_event
        return pad

    # -- signalling ------------------------------------------------------------
    def on_ready_to_paused(self) -> None:
        uri = self.get_property("signaller-uri")
        if self.get_property("run-signalling-server"):
            from ...net.webrtc_signalling import SignallingServer

            self._own_server = SignallingServer(
                self.get_property("signalling-server-host"),
                self.get_property("signalling-server-port"))
            uri = f"ws://127.0.0.1:{self._own_server.port}"
            self._props["signaller-uri"] = uri
        self._client = SignallingClient(uri, self._on_signal)
        self._client.wait_welcome()
        self._client.send({
            "type": "setPeerStatus",
            "roles": ["producer"],
            "meta": self.get_property("meta"),
        })

    def on_paused_to_ready(self) -> None:
        with self._lock:
            sessions, self._sessions = dict(self._sessions), {}
        for sid, pc in sessions.items():
            if self._client:
                try:
                    self._client.send(msg_end_session(sid))
                except Exception:
                    pass
            pc.close()
        if self._client:
            self._client.close()
            self._client = None
        if self._own_server is not None:
            self._own_server.stop()
            self._own_server = None

    def _on_signal(self, msg: dict) -> None:
        t = msg.get("type")
        if t == "startSession":
            self._start_session(msg["sessionId"])
        elif t == "peer":
            sid = msg.get("sessionId")
            with self._lock:
                pc = self._sessions.get(sid)
            if pc is None:
                return
            sdp = msg.get("sdp")
            if sdp and sdp.get("type") == "answer":
                try:
                    pc.handle_answer(sdp["sdp"])
                except WebRtcError as e:
                    self.post_message(Message(MessageType.WARNING, text=str(e)))
            ice = msg.get("ice")
            if ice:
                pc.add_remote_ice(ice["candidate"])
        elif t == "endSession":
            self._end_session(msg.get("sessionId"))

    def _start_session(self, session_id: str) -> None:
        # caps may still be propagating when the first consumer asks for a
        # session — wait briefly so the offer advertises the real media
        deadline = time.monotonic() + 2.0
        while self._rtp_media is None and self.caps is None \
                and time.monotonic() < deadline:
            time.sleep(0.02)
        pc = PeerConnection(offerer=True)
        pc.on_rtcp = self._on_rtcp  # loss reports drive the encoder bitrate
        media, pt, enc, rate = self._rtp_media or _caps_media(self.caps)
        pc.set_media(media, pt, enc, rate)
        for entry in self._extra_pads:
            if entry["media"] is not None:
                pc.add_media(*entry["media"])
        with self._lock:
            self._sessions[session_id] = pc
        pc.start()
        offer = pc.create_offer("sendonly")
        self._client.send(msg_peer_sdp(session_id, "offer", offer))
        self.post_message(Message(
            MessageType.ELEMENT, name="webrtcsink-session-started", session_id=session_id
        ))

    def _end_session(self, session_id: Optional[str]) -> None:
        with self._lock:
            pc = self._sessions.pop(session_id, None)
        if pc:
            pc.close()

    # -- media -------------------------------------------------------------------
    def render(self, buffer: Buffer) -> FlowReturn:
        if self._chain_head is not None:
            return self._chain_head.chain(buffer)
        return self._send_rtp_buffer(buffer)

    def on_event(self, event) -> None:
        from ...core.events import EventType

        # EOS must reach the internal encoder so it drains its lookahead
        if event.type == EventType.EOS and self._chain_head is not None:
            self._chain_head.send_event(event)

    def connected_sessions(self) -> List[str]:
        with self._lock:
            return [sid for sid, pc in self._sessions.items() if pc._connected.is_set()]

    def wait_any_connected(self, timeout: float = 10.0) -> bool:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self.connected_sessions():
                return True
            time.sleep(0.02)
        return False


@register
class WebRtcSrc(BaseSrc):
    ELEMENT_NAME = "webrtcsrc"
    EXTRA_PAD_TEMPLATES = [
        ('stream_%u', 'src', 'sometimes', 'application/x-rtp'),
    ]
    ELEMENT_CLASS = "Source/Network/WebRTC"
    ELEMENT_DESCRIPTION = "WebRTC consumer with gst-webrtc signalling (ICE+DTLS-SRTP)"
    SRC_CAPS = RTP_CAPS
    IS_LIVE = True
    PROPERTIES = [
        Prop("signaller-uri", "ws://127.0.0.1:8443", type="str"),
        Prop("producer-peer-id", None, type="str",
             doc="producer to connect to; None = first producer to appear "
                 "(requires connect-to-first-producer)"),
        Prop("connect-to-first-producer", True, type="bool",
             doc="with no producer-peer-id, connect to the first producer "
                 "that appears (reference defaults false and errors; this "
                 "framework defaults true — documented divergence)"),
        Prop("meta", None, type="object"),
        Prop("timeout", 10_000_000_000, type="uint64",
             doc="ns to wait for media before giving up (0 = forever)"),
        Prop("output", "rtp", type="enum", choices=["rtp", "raw"],
             doc="raw: depayload + decode the primary section internally "
                 "(AV1 via rtpav1depay2 + dav1ddec, L16 via rtpL16depay2) — "
                 "the reference webrtcsrc's decoded-output role"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[SignallingClient] = None
        self._pc: Optional[PeerConnection] = None
        self._session_id: Optional[str] = None
        # items: (media_index, packet) or None for EOS
        self._rtp_queue: "queue.Queue" = queue.Queue()
        self._media = ("video", 96, "VP8", 90000)
        self._producer_evt = threading.Event()
        self._producer_id: Optional[str] = None
        self._extra_pads = {}  # media index -> sometimes Pad

    def start(self) -> None:
        self._client = SignallingClient(self.get_property("signaller-uri"), self._on_signal)
        self._client.wait_welcome()
        self._client.send({
            "type": "setPeerStatus",
            "roles": ["consumer", "listener"],
            "meta": self.get_property("meta"),
        })
        wanted = self.get_property("producer-peer-id")
        if wanted:
            self._producer_id = wanted
            self._producer_evt.set()
        elif not self.get_property("connect-to-first-producer"):
            raise RuntimeError(
                "webrtcsrc: no producer-peer-id set and "
                "connect-to-first-producer is false")
        else:
            # poll the producer list until one appears (the reference's
            # webrtcsrc listens for peerStatusChanged the same way; the list
            # re-request covers producers that registered concurrently)
            deadline = time.monotonic() + 10.0
            while not self._producer_evt.is_set() and time.monotonic() < deadline:
                self._client.send({"type": "list"})
                self._producer_evt.wait(0.5)
        if not self._producer_evt.wait(10.0):
            raise RuntimeError("webrtcsrc: no producer available")
        self._client.send({
            "type": "startSession", "peerId": self._producer_id, "offer": None,
        })
        # wait for the producer's offer so caps (media/pt/encoding) are known
        # before the source negotiates downstream
        deadline = time.monotonic() + 10.0
        while self._pc is None and time.monotonic() < deadline:
            time.sleep(0.02)
        if self._pc is None:
            raise RuntimeError("webrtcsrc: producer sent no offer")

    def stop(self) -> None:
        if self._client and self._session_id:
            try:
                self._client.send(msg_end_session(self._session_id))
            except Exception:
                pass
        if self._pc:
            self._pc.close()
            self._pc = None
        if self._client:
            self._client.close()
            self._client = None
        self._rtp_queue.put(None)

    def _on_signal(self, msg: dict) -> None:
        t = msg.get("type")
        if t == "list":
            producers = msg.get("producers", [])
            if producers and not self._producer_evt.is_set():
                self._producer_id = producers[0]["id"]
                self._producer_evt.set()
        elif t == "peerStatusChanged":
            if "producer" in msg.get("roles", []) and not self._producer_evt.is_set():
                self._producer_id = msg.get("peerId")
                self._producer_evt.set()
        elif t == "sessionStarted":
            self._session_id = msg["sessionId"]
        elif t == "peer":
            sdp = msg.get("sdp")
            if sdp and sdp.get("type") == "offer":
                self._on_offer(msg["sessionId"], sdp["sdp"])
            ice = msg.get("ice")
            if ice and self._pc:
                self._pc.add_remote_ice(ice["candidate"])
        elif t == "endSession":
            self._rtp_queue.put(None)

    def _on_offer(self, session_id: str, offer: str) -> None:
        self._session_id = session_id
        pc = PeerConnection(offerer=False)
        pc.on_rtp_media = lambda idx, pkt: self._rtp_queue.put((idx, pkt))
        pc.start()
        answer = pc.handle_offer(offer, "recvonly")
        # media description for our caps
        import re
        m = re.search(r"^m=(\w+) \d+ [\w/]+ (\d+)", offer, re.M)
        rtpmap = re.search(r"^a=rtpmap:(\d+) ([\w\-]+)/(\d+)", offer, re.M)
        if m and rtpmap:
            self._media = (m.group(1), int(rtpmap.group(1)), rtpmap.group(2), int(rtpmap.group(3)))
        # publish LAST: start() unblocks on _pc and reads _media for caps
        self._pc = pc
        self._client.send(msg_peer_sdp(session_id, "answer", answer))

    def fixate(self, caps: Caps) -> Caps:
        from ...core.parse import parse_caps

        media, pt, enc, rate = self._media
        if self.get_property("output") == "raw":
            if enc == "AV1":
                return Caps.builder("video/x-raw", format="I420")
            if enc == "L16":
                from ...core.caps import Structure
                return Caps([Structure("audio/x-raw", format="S16", rate=rate,
                                       channels=1, layout="interleaved")])
        return parse_caps(
            f"application/x-rtp,media={media},payload={pt},"
            f"encoding-name={enc},clock-rate={rate}"
        )

    def _build_decode_chain(self):
        """rtp -> depay -> decoder feeding the static src pad (raw mode)."""
        from ...core.element import Pad, PadDirection, PadPresence, PadTemplate, State
        from ...core.events import Event, Segment
        from ...core.parse import parse_caps
        from ...core.registry import element_factory_make

        media, pt, enc, rate = self._media
        if enc == "AV1":
            chain = [element_factory_make("rtpav1depay2", f"{self.name}-depay"),
                     element_factory_make("dav1ddec", f"{self.name}-dec")]
        elif enc == "L16":
            chain = [element_factory_make("rtpL16depay2", f"{self.name}-depay")]
        else:
            raise RuntimeError(f"{self.name}: no decoder wired for {enc}")
        for a, b in zip(chain, chain[1:]):
            a.link(b)
        terminal = Pad(f"{self.name}-raw-out", PadDirection.SINK,
                       PadTemplate("inner", PadDirection.SINK, PadPresence.ALWAYS,
                                   Caps.new_any()))
        terminal.element = self

        def forward(pad, buf):
            return self.srcpad.push(buf)

        def forward_event(pad, ev):
            from ...core.events import EventType

            # the decoder's caps describe the decoded frames downstream
            if ev.type == EventType.CAPS:
                self.srcpad.current_caps = ev.get("caps")
            if ev.type in (EventType.CAPS, EventType.EOS):
                return self.srcpad.push_event(ev)
            return True

        terminal.chain_function = forward
        terminal.event_function = forward_event
        tail = chain[-1].src_pads()[0]
        tail.peer = terminal
        terminal.peer = tail
        for e in chain:
            e.set_state(State.PLAYING)
        head = chain[0].sink_pads()[0]
        head.send_event(Event.new_stream_start(f"{self.name}-raw"))
        head.send_event(Event.new_caps(parse_caps(
            f"application/x-rtp,media={media},payload={pt},"
            f"encoding-name={enc},clock-rate={rate}")))
        head.send_event(Event.new_segment(Segment()))
        self._decode_chain = chain
        self._decode_head = head

    def create(self):
        timeout = self.get_property("timeout")
        try:
            item = self._rtp_queue.get(timeout=(timeout / 1e9) if timeout else None)
        except queue.Empty:
            return None
        if item is None:
            if getattr(self, "_decode_head", None) is not None:
                from ...core.events import Event

                # drain the decoder before the source's own EOS
                self._decode_head.send_event(Event.new_eos())
            return None
        idx, data = item
        if idx == 0:
            if self.get_property("output") == "raw":
                if getattr(self, "_decode_head", None) is None:
                    self._build_decode_chain()
                self._decode_head.chain(Buffer(np.frombuffer(data, np.uint8)))
                return BaseSrc.RETRY
            return Buffer(np.frombuffer(data, np.uint8))
        # extra BUNDLE sections flow on sometimes pads stream_%u
        pad = self._pad_for_section(idx)
        if pad.peer is not None:
            pad.push(Buffer(np.frombuffer(data, np.uint8)))
        return BaseSrc.RETRY

    def _pad_for_section(self, idx: int):
        from ...core.element import Pad, PadDirection, PadPresence, PadTemplate
        from ...core.events import Event, Segment
        from ...core.parse import parse_caps

        if idx not in self._extra_pads:
            pad = Pad(f"stream_{idx}", PadDirection.SRC,
                      PadTemplate("stream_%u", PadDirection.SRC,
                                  PadPresence.SOMETIMES, RTP_CAPS))
            self.add_pad(pad)
            self._extra_pads[idx] = pad
            if self.on_new_pad:
                self.on_new_pad(pad)
            m = self._pc.medias[idx] if self._pc and idx < len(self._pc.medias) else None
            caps = parse_caps(
                f"application/x-rtp,media={m['media']},payload={m['pt']},"
                f"encoding-name={m['encoding']},clock-rate={m['rate']}"
            ) if m else RTP_CAPS
            pad.push_event(Event.new_stream_start(f"{self.name}-stream-{idx}"))
            pad.push_event(Event.new_caps(caps))
            pad.push_event(Event.new_segment(Segment()))
        return self._extra_pads[idx]

    on_new_pad = None
