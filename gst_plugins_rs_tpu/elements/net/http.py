"""HTTP elements: reqwesthttpsrc and icecastsink.

Parity targets: net/reqwest (reqwesthttpsrc, reqwesthttpsrc/imp.rs:167 —
HTTP(S) source with ranges/redirects/auth) and net/icecast (icecastsink,
icecastsink/imp.rs:98 — streams audio to an Icecast server via HTTP PUT
with ice-* headers and basic auth).

reqwest maps to urllib here (stdlib; no egress in this environment, so
tests run against a loopback http.server).  icecastsink speaks the
Icecast 2.4 HTTP PUT protocol over a raw socket with `100-continue`
handling.
"""
from __future__ import annotations

import base64
import socket
from typing import Optional
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


@register
class ReqwestHttpSrc(BaseSrc):
    ELEMENT_NAME = "reqwesthttpsrc"
    ELEMENT_CLASS = "Source/Network/HTTP"
    ELEMENT_DESCRIPTION = "HTTP(S) source"
    PROPERTIES = [
        Prop("location", None, type="str"),
        Prop("user-agent", "gst_plugins_rs_tpu/reqwesthttpsrc", type="str"),
        Prop("timeout", 15, type="uint", doc="seconds, 0 = none"),
        Prop("blocksize", 65536, type="uint", minimum=1),
        Prop("user-id", None, type="str"),
        Prop("user-pw", None, type="str"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._resp = None
        self.content_type: Optional[str] = None

    def start(self) -> None:
        loc = self.get_property("location")
        if not loc:
            raise RuntimeError(f"{self.name}: no location set")
        req = Request(loc, headers={"User-Agent": self.get_property("user-agent")})
        uid, pw = self.get_property("user-id"), self.get_property("user-pw")
        if uid is not None:
            cred = base64.b64encode(f"{uid}:{pw or ''}".encode()).decode()
            req.add_header("Authorization", f"Basic {cred}")
        timeout = self.get_property("timeout") or None
        self._resp = urlopen(req, timeout=timeout)
        self.content_type = self._resp.headers.get("Content-Type")

    def stop(self) -> None:
        if self._resp is not None:
            self._resp.close()
            self._resp = None

    def fixate(self, caps: Caps) -> Caps:
        if not caps.is_any():
            return caps.fixate()
        ct = (self.content_type or "application/octet-stream").split(";")[0]
        return Caps.builder(ct if "/" in ct else "application/octet-stream")

    def create(self) -> Optional[Buffer]:
        data = self._resp.read(self.get_property("blocksize"))
        if not data:
            return None
        return Buffer(np.frombuffer(data, np.uint8))


@register
class IcecastSink(BaseSink):
    ELEMENT_NAME = "icecastsink"
    ELEMENT_CLASS = "Sink/Network"
    ELEMENT_DESCRIPTION = "Streams to an Icecast server (HTTP PUT)"
    PROPERTIES = [
        Prop("host", "127.0.0.1", type="str"),
        Prop("port", 8000, type="uint", minimum=1, maximum=65535),
        Prop("mount", "/stream", type="str"),
        Prop("username", "source", type="str"),
        Prop("password", "hackme", type="str"),
        Prop("stream-name", "", type="str"),
        Prop("genre", "", type="str"),
        Prop("description", "", type="str"),
        Prop("public", False, type="bool"),
        Prop("content-type", "application/ogg", type="str"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None

    def on_ready_to_paused(self) -> None:
        self._sock = socket.create_connection(
            (self.get_property("host"), self.get_property("port")), timeout=5
        )
        mount = self.get_property("mount")
        if not mount.startswith("/"):
            mount = "/" + mount
        cred = base64.b64encode(
            f"{self.get_property('username')}:{self.get_property('password')}".encode()
        ).decode()
        headers = [
            f"PUT {mount} HTTP/1.1",
            f"Host: {self.get_property('host')}:{self.get_property('port')}",
            f"Authorization: Basic {cred}",
            f"Content-Type: {self.get_property('content-type')}",
            "Expect: 100-continue",
            f"Ice-Public: {1 if self.get_property('public') else 0}",
        ]
        for prop, hdr in (("stream-name", "Ice-Name"), ("genre", "Ice-Genre"),
                          ("description", "Ice-Description")):
            v = self.get_property(prop)
            if v:
                headers.append(f"{hdr}: {v}")
        self._sock.sendall(("\r\n".join(headers) + "\r\n\r\n").encode())
        reply = self._sock.recv(4096).decode(errors="replace")
        if "100" not in reply.split("\r\n")[0] and "200" not in reply.split("\r\n")[0]:
            raise RuntimeError(f"{self.name}: icecast rejected the stream: {reply.splitlines()[:1]}")

    def on_paused_to_ready(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def render(self, buffer: Buffer) -> FlowReturn:
        d = buffer.data
        data = d.encode() if isinstance(d, str) else np.asarray(d, np.uint8).tobytes()
        self._sock.sendall(data)
        return FlowReturn.OK


__all__ = ["ReqwestHttpSrc", "IcecastSink"]
