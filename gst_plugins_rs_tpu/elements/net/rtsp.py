"""rtspsrc2: RTSP client source (RFC 2326/7826 subset over TCP + RTP/UDP).

Parity target: net/rtsp (rtspsrc2, 6246 LoC).  Implements the client state
machine OPTIONS -> DESCRIBE (SDP) -> SETUP (RTP/AVP;unicast;client_port)
-> PLAY -> TEARDOWN, with per-media UDP receive sockets.  The first media
stream flows on the static src pad; additional streams appear as
sometimes pads `stream_%u` (reference pad naming), all with
application/x-rtp caps built from the SDP rtpmap.

Interleaved-TCP transport and RTSP authentication are not implemented yet
(noted divergence); tests drive a loopback fake server.
"""
from __future__ import annotations

import socket
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from ...core import (
    BaseSrc,
    Buffer,
    Caps,
    Event,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    register,
)
from ...core.caps import Structure
from ...core.events import Segment
from ...net.sdp import Sdp, parse_sdp

RTP_CAPS = Caps.builder("application/x-rtp")


class _Stream:
    def __init__(self, index: int, media, sock: socket.socket):
        self.index = index
        self.media = media
        self.sock = sock
        self.pad: Optional[Pad] = None
        self.started = False

    def caps(self) -> Caps:
        m = self.media
        fields = {"media": m.media, "payload": m.payload_type}
        if m.encoding_name:
            fields["encoding-name"] = m.encoding_name
        if m.clock_rate:
            fields["clock-rate"] = m.clock_rate
        if m.encoding_params:
            fields["encoding-params"] = m.encoding_params
        return Caps([Structure("application/x-rtp", **fields)])


@register
class RtspSrc2(BaseSrc):
    ELEMENT_NAME = "rtspsrc2"
    ELEMENT_CLASS = "Source/Network"
    ELEMENT_DESCRIPTION = "RTSP client source (RTP over UDP)"
    IS_LIVE = True
    SRC_CAPS = RTP_CAPS
    PROPERTIES = [
        Prop("location", None, type="str", doc="rtsp:// URL"),
        Prop("timeout", 2_000_000_000, type="uint64", doc="ns without data -> EOS"),
        Prop("num-buffers", 0, type="uint", doc="stop after N RTP packets (0 = unbounded)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._conn: Optional[socket.socket] = None
        self._cseq = 0
        self._session = ""
        self._streams: List[_Stream] = []
        self._count = 0
        self.sdp: Optional[Sdp] = None

    # -- RTSP protocol -----------------------------------------------------------
    def _request(self, method: str, url: str, extra: Dict[str, str] = {}) -> Tuple[Dict[str, str], bytes]:
        self._cseq += 1
        lines = [f"{method} {url} RTSP/1.0", f"CSeq: {self._cseq}"]
        if self._session:
            lines.append(f"Session: {self._session}")
        for k, v in extra.items():
            lines.append(f"{k}: {v}")
        self._conn.sendall(("\r\n".join(lines) + "\r\n\r\n").encode())
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = self._conn.recv(4096)
            if not chunk:
                raise RuntimeError(f"{self.name}: server closed during {method}")
            data += chunk
        head, _, body = data.partition(b"\r\n\r\n")
        head_lines = head.decode(errors="replace").split("\r\n")
        status = head_lines[0].split()
        if status[1] != "200":
            raise RuntimeError(f"{self.name}: {method} failed: {head_lines[0]}")
        headers = {}
        for hl in head_lines[1:]:
            k, _, v = hl.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        while len(body) < length:
            body += self._conn.recv(4096)
        return headers, body

    def start(self) -> None:
        loc = self.get_property("location")
        if not loc:
            raise RuntimeError(f"{self.name}: no location set")
        url = urlparse(loc)
        self._conn = socket.create_connection((url.hostname, url.port or 554), timeout=5)
        self._cseq = 0
        self._session = ""
        self._count = 0
        self._request("OPTIONS", loc)
        headers, body = self._request("DESCRIBE", loc, {"Accept": "application/sdp"})
        self.sdp = parse_sdp(body.decode(errors="replace"))
        if not self.sdp.medias:
            raise RuntimeError(f"{self.name}: no media in SDP")
        base = headers.get("content-base", loc).rstrip("/")
        self._streams = []
        for i, media in enumerate(self.sdp.medias):
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            sock.bind(("0.0.0.0", 0))
            port = sock.getsockname()[1]
            control = media.control or str(i)
            setup_url = control if control.startswith("rtsp://") else f"{base}/{control}"
            headers, _ = self._request(
                "SETUP", setup_url,
                {"Transport": f"RTP/AVP;unicast;client_port={port}-{port + 1}"},
            )
            self._session = headers.get("session", self._session).split(";")[0]
            self._streams.append(_Stream(i, media, sock))
        self._request("PLAY", loc, {"Range": "npt=0-"})
        timeout = self.get_property("timeout") / 1e9
        for st in self._streams:
            st.sock.settimeout(timeout)

    def stop(self) -> None:
        if self._conn is not None:
            try:
                self._request("TEARDOWN", self.get_property("location"))
            except Exception:
                pass
            self._conn.close()
            self._conn = None
        for st in self._streams:
            st.sock.close()
        self._streams = []

    # -- pads/negotiation ---------------------------------------------------------
    def _pad_for(self, st: _Stream) -> Pad:
        if st.pad is None:
            if st.index == 0:
                st.pad = self.srcpad
            else:
                st.pad = Pad(f"stream_{st.index}", PadDirection.SRC,
                             PadTemplate("stream_%u", PadDirection.SRC,
                                         PadPresence.SOMETIMES, RTP_CAPS))
                self.add_pad(st.pad)
        if not st.started and st.pad.peer is not None:
            st.started = True
            st.pad.push_event(Event.new_stream_start(f"{self.name}-stream{st.index}"))
            st.pad.push_event(Event.new_caps(st.caps()))
            st.pad.push_event(Event.new_segment(Segment()))
        return st.pad

    def negotiate(self) -> Caps:
        return self._streams[0].caps() if self._streams else super().negotiate()

    def iterate(self):
        from ...core.element import FlowReturn

        if self._eos_sent:
            return FlowReturn.EOS
        maxn = self.get_property("num-buffers")
        if maxn and self._count >= maxn:
            return self._finish()
        wait_s = self.get_property("timeout") / 1e9
        progressed = False
        for st in self._streams:
            try:
                # block (up to the timeout) for the first stream, then just
                # drain whatever else is queued without waiting
                st.sock.settimeout(0.0 if progressed else wait_s)
                data, _ = st.sock.recvfrom(65536)
            except (socket.timeout, BlockingIOError):
                continue
            pad = self._pad_for(st)
            self._count += 1
            if pad.peer is not None:
                pad.push(Buffer(np.frombuffer(data, np.uint8)))
            progressed = True
        if not progressed:
            return self._finish()
        return FlowReturn.OK

    def _finish(self):
        from ...core.element import FlowReturn

        self._eos_sent = True
        for st in self._streams:
            if st.pad is not None and st.pad.peer is not None:
                st.pad.push_event(Event.new_eos())
        return FlowReturn.EOS


__all__ = ["RtspSrc2"]
