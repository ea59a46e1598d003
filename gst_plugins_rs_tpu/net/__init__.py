"""Network data plane: RTP packetization and UDP transport.

Parity family: reference net/rtp (RFC 3550 packets, pay/depay element
pairs, net/rtp/src/lib.rs:59-126) and net/udp + threadshare udp elements.
Packet byte-twiddling is host control plane; the media payloads themselves
stay device arrays until the socket boundary.
"""
from . import rtp  # noqa: F401
