"""UDP transport elements: udpsrc2, ts-udpsrc, ts-udpsink.

Parity targets: reference net/udp (udpsrc2, net/udp/src/udpsrc/imp.rs:106)
and threadshare ts-udpsrc/ts-udpsink (generic/threadshare/src/udpsrc/
imp.rs:803, udpsink/imp.rs:112).  The reference threadshare design point —
amortize wakeups across many sockets on few threads — maps here to the
synchronous scheduler draining whatever datagrams are queued per iteration;
stream batching happens downstream (parallel.StreamBank).

Buffers carry datagrams as 1-D uint8 arrays.  Caps on udpsrc are set via the
`caps` property (like the reference), since raw datagrams carry no format.
"""
from __future__ import annotations

import socket
from typing import Optional

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


class _UdpSrcBase(BaseSrc):
    ELEMENT_CLASS = "Source/Network"
    PROPERTIES = [
        Prop("address", "0.0.0.0", type="str"),
        Prop("port", 5004, type="uint", minimum=0, maximum=65535),
        Prop("context", "", type="str",
             doc="shared drain context; elements naming the same context share "
                 "one epoll thread (threadshare Context::acquire analog)"),
        Prop("context-wait", 5, type="uint", doc="context poll period (ms)"),
        Prop("caps", None, type="object", doc="caps of the stream (string or Caps)"),
        Prop("buffer-size", 0, type="uint", doc="SO_RCVBUF, 0 = OS default"),
        Prop("timeout", 1_000_000_000, type="uint64",
             doc="ns to wait for a datagram before EOS (0 = block forever)"),
        Prop("num-buffers", 0, type="uint", doc="stop after N datagrams (0 = unbounded)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None
        self._count = 0
        self._ctx = None
        self._ctx_queue = None

    def start(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        bufsize = self.get_property("buffer-size")
        if bufsize:
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, bufsize)
        self._sock.bind((self.get_property("address"), self.get_property("port")))
        timeout = self.get_property("timeout")
        ctx_name = self.get_property("context")
        if ctx_name:
            from ...net.context import Context

            self._ctx = Context.acquire(ctx_name, self.get_property("context-wait"))
            self._ctx_queue = self._ctx.add_socket(self._sock)
        else:
            self._sock.settimeout(timeout / 1e9 if timeout else None)
        self._count = 0

    def stop(self) -> None:
        if self._ctx is not None:
            self._ctx.remove_socket(self._sock)
            self._ctx.release()
            self._ctx = None
            self._ctx_queue = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    @property
    def bound_port(self) -> int:
        """Actual bound port (useful with port=0)."""
        assert self._sock is not None
        return self._sock.getsockname()[1]

    def fixate(self, caps: Caps) -> Caps:
        prop = self.get_property("caps")
        if prop is not None:
            if isinstance(prop, str):
                prop = parse_caps(prop)
            return prop
        return caps.fixate() if not caps.is_any() else Caps.builder("application/octet-stream")

    def create(self) -> Optional[Buffer]:
        maxn = self.get_property("num-buffers")
        if maxn and self._count >= maxn:
            return None
        timeout = self.get_property("timeout")
        if self._ctx_queue is not None:
            import queue as _queue

            try:
                data = self._ctx_queue.get(timeout=(timeout / 1e9) if timeout else None)
            except _queue.Empty:
                return None
        else:
            try:
                data, _addr = self._sock.recvfrom(65536)
            except socket.timeout:
                return None  # EOS on idle, like fallbacksrc-style timeout handling
        self._count += 1
        return Buffer(np.frombuffer(data, np.uint8))


@register
class UdpSrc2(_UdpSrcBase):
    ELEMENT_NAME = "udpsrc2"
    ELEMENT_DESCRIPTION = "Receives UDP datagrams as buffers"


@register
class TsUdpSrc(_UdpSrcBase):
    ELEMENT_NAME = "ts-udpsrc"
    ELEMENT_DESCRIPTION = "Receives UDP datagrams as buffers (threadshare analog)"


@register
class TsUdpSink(BaseSink):
    ELEMENT_NAME = "ts-udpsink"
    ELEMENT_CLASS = "Sink/Network"
    ELEMENT_DESCRIPTION = "Sends buffers as UDP datagrams"
    PROPERTIES = [
        Prop("host", "127.0.0.1", type="str"),
        Prop("port", 5004, type="uint", minimum=0, maximum=65535),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sock: Optional[socket.socket] = None

    def on_ready_to_paused(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def on_paused_to_ready(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def render(self, buffer: Buffer) -> FlowReturn:
        data = np.asarray(buffer.data, dtype=np.uint8).tobytes()
        self._sock.sendto(data, (self.get_property("host"), self.get_property("port")))
        return FlowReturn.OK


__all__ = ["UdpSrc2", "TsUdpSrc", "TsUdpSink"]
