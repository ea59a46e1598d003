"""whipsink / whepsrc: WHIP and WHEP HTTP signaling (RFC 9725 / draft WHEP).

Parity target: net/webrtchttp (whipsink, whepsrc).  The HTTP state machine
is implemented faithfully: POST an SDP offer (application/sdp, optional
Bearer token), expect 201 Created with a Location resource and an SDP
answer, DELETE the resource on teardown.

Media-path divergence (documented): the reference negotiates full WebRTC
(ICE/DTLS/SRTP via webrtcbin).  No ICE/DTLS stack exists in this
environment, so media flows as plain RTP over UDP using the host/port
from the SDP (c=/m= lines) — the signaling interops, the media leg is
this framework's own.  Tests drive both against in-process fake servers.
"""
from __future__ import annotations

import socket
from typing import Optional
from urllib.error import HTTPError
from urllib.request import Request, urlopen

import numpy as np

from ...core import (
    BaseSink,
    BaseSrc,
    Buffer,
    Caps,
    FlowReturn,
    Prop,
    register,
)
from ...core.parse import parse_caps
from ...net.sdp import parse_sdp

RTP_CAPS = Caps.builder("application/x-rtp")


def _http(url: str, method: str, body: Optional[bytes], token: Optional[str],
          content_type: str = "application/sdp"):
    req = Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", content_type)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    return urlopen(req, timeout=5)


def _offer_sdp(media: str, port: int, pt: int, encoding: str, rate: int,
               direction: str) -> str:
    return "\r\n".join([
        "v=0",
        "o=- 0 0 IN IP4 127.0.0.1",
        "s=gstpu",
        "c=IN IP4 127.0.0.1",
        "t=0 0",
        f"m={media} {port} RTP/AVP {pt}",
        f"a=rtpmap:{pt} {encoding}/{rate}",
        f"a={direction}",
        "",
    ])


@register
class WhipSink(BaseSink):
    ELEMENT_NAME = "whipsink"
    ELEMENT_CLASS = "Sink/Network/WebRTC"
    ELEMENT_DESCRIPTION = "Sends RTP to a WHIP endpoint (HTTP signaling per RFC 9725)"
    SINK_CAPS = RTP_CAPS
    PROPERTIES = [
        Prop("whip-endpoint", None, type="str"),
        Prop("auth-token", None, type="str"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None
        self._dest = None
        self._resource: Optional[str] = None
        self.answer_sdp: Optional[str] = None

    def _signal(self) -> None:
        caps = self.caps.structure(0) if self.caps else None
        media = caps.get("media", "audio") if caps else "audio"
        pt = caps.get("payload", 96) if caps else 96
        encoding = caps.get("encoding-name", "OPUS") if caps else "OPUS"
        rate = caps.get("clock-rate", 48000) if caps else 48000
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("0.0.0.0", 0))
        offer = _offer_sdp(media, self._sock.getsockname()[1], pt, encoding,
                           rate, "sendonly")
        endpoint = self.get_property("whip-endpoint")
        resp = _http(endpoint, "POST", offer.encode(),
                     self.get_property("auth-token"))
        if resp.status not in (200, 201):
            raise RuntimeError(f"{self.name}: WHIP POST failed: {resp.status}")
        location = resp.headers.get("Location", "")
        if location.startswith("/"):
            from urllib.parse import urlsplit

            parts = urlsplit(endpoint)
            location = f"{parts.scheme}://{parts.netloc}{location}"
        self._resource = location
        self.answer_sdp = resp.read().decode(errors="replace")
        sdp = parse_sdp(self.answer_sdp)
        if not sdp.medias:
            raise RuntimeError(f"{self.name}: WHIP answer has no media")
        host = "127.0.0.1"
        for line in self.answer_sdp.splitlines():
            if line.startswith("c=IN IP4 "):
                host = line.split()[-1]
        self._dest = (host, sdp.medias[0].port)

    def on_caps(self, caps: Caps) -> None:
        if self._dest is None:
            self._signal()

    def on_paused_to_ready(self) -> None:
        if self._resource:
            try:
                _http(self._resource, "DELETE", None, self.get_property("auth-token"))
            except (HTTPError, OSError):
                pass
            self._resource = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None
        self._dest = None

    def render(self, buffer: Buffer) -> FlowReturn:
        if self._dest is None:
            self._signal()
        self._sock.sendto(np.asarray(buffer.data, np.uint8).tobytes(), self._dest)
        return FlowReturn.OK


@register
class WhepSrc(BaseSrc):
    ELEMENT_NAME = "whepsrc"
    ELEMENT_CLASS = "Source/Network/WebRTC"
    ELEMENT_DESCRIPTION = "Receives RTP from a WHEP endpoint (HTTP signaling)"
    IS_LIVE = True
    SRC_CAPS = RTP_CAPS
    PROPERTIES = [
        Prop("whep-endpoint", None, type="str"),
        Prop("auth-token", None, type="str"),
        Prop("caps", None, type="object", doc="rtp caps of the stream"),
        Prop("timeout", 2_000_000_000, type="uint64"),
        Prop("num-buffers", 0, type="uint"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None
        self._resource: Optional[str] = None
        self._count = 0
        self.answer_sdp: Optional[str] = None

    def start(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("0.0.0.0", 0))
        self._sock.settimeout(self.get_property("timeout") / 1e9)
        self._count = 0
        offer = _offer_sdp("audio", self._sock.getsockname()[1], 96, "OPUS",
                           48000, "recvonly")
        endpoint = self.get_property("whep-endpoint")
        resp = _http(endpoint, "POST", offer.encode(), self.get_property("auth-token"))
        if resp.status not in (200, 201):
            raise RuntimeError(f"{self.name}: WHEP POST failed: {resp.status}")
        location = resp.headers.get("Location", "")
        if location.startswith("/"):
            from urllib.parse import urlsplit

            parts = urlsplit(endpoint)
            location = f"{parts.scheme}://{parts.netloc}{location}"
        self._resource = location
        self.answer_sdp = resp.read().decode(errors="replace")

    def stop(self) -> None:
        if self._resource:
            try:
                _http(self._resource, "DELETE", None, self.get_property("auth-token"))
            except (HTTPError, OSError):
                pass
            self._resource = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def fixate(self, caps: Caps) -> Caps:
        prop = self.get_property("caps")
        if prop is not None:
            return prop if not isinstance(prop, str) else parse_caps(prop)
        return RTP_CAPS.copy()

    def create(self) -> Optional[Buffer]:
        maxn = self.get_property("num-buffers")
        if maxn and self._count >= maxn:
            return None
        try:
            data, _ = self._sock.recvfrom(65536)
        except socket.timeout:
            return None
        self._count += 1
        return Buffer(np.frombuffer(data, np.uint8))


__all__ = ["WhipSink", "WhepSrc"]
