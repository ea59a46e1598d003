"""RFC 3550 RTCP packet serialization/parsing: SR, RR, SDES, BYE.

From-scratch equivalent of the rtcp-types crate used by the reference's
rtpbin2 session machinery (net/rtp/src/rtpbin2/session.rs).  Compound
packets are concatenations of 32-bit-aligned packets, each with the common
|V=2|P|count|PT|length| header.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

PT_SR = 200
PT_RR = 201
PT_SDES = 202
PT_BYE = 203

# NTP epoch (1900) to UNIX epoch (1970) in seconds
NTP_UNIX_OFFSET = 2_208_988_800


def ntp_from_ns(unix_ns: int) -> int:
    """64-bit NTP timestamp from unix nanoseconds."""
    secs, frac_ns = divmod(unix_ns, 1_000_000_000)
    return ((secs + NTP_UNIX_OFFSET) << 32) | (frac_ns * (1 << 32) // 1_000_000_000)


@dataclass
class ReportBlock:
    ssrc: int
    fraction_lost: int  # 0..255
    cumulative_lost: int
    ext_highest_seq: int
    jitter: int
    lsr: int  # middle 32 bits of last SR NTP
    dlsr: int  # delay since last SR, 1/65536 s

    def to_bytes(self) -> bytes:
        lost = self.cumulative_lost & 0xFFFFFF
        return struct.pack(
            ">IIIIII",
            self.ssrc,
            (self.fraction_lost << 24) | lost,
            self.ext_highest_seq & 0xFFFFFFFF,
            self.jitter,
            self.lsr,
            self.dlsr,
        )

    @staticmethod
    def parse(data: bytes) -> "ReportBlock":
        ssrc, fl_lost, seq, jitter, lsr, dlsr = struct.unpack_from(">IIIIII", data)
        lost = fl_lost & 0xFFFFFF
        if lost >= 0x800000:
            lost -= 0x1000000
        return ReportBlock(ssrc, fl_lost >> 24, lost, seq, jitter, lsr, dlsr)


def _header(pt: int, count: int, payload: bytes) -> bytes:
    assert len(payload) % 4 == 0
    return struct.pack(">BBH", (2 << 6) | count, pt, len(payload) // 4) + payload


@dataclass
class SenderReport:
    ssrc: int
    ntp_timestamp: int  # 64-bit NTP
    rtp_timestamp: int
    packet_count: int
    octet_count: int
    reports: List[ReportBlock] = field(default_factory=list)

    def to_bytes(self) -> bytes:
        body = struct.pack(
            ">IQIII",
            self.ssrc,
            self.ntp_timestamp,
            self.rtp_timestamp & 0xFFFFFFFF,
            self.packet_count & 0xFFFFFFFF,
            self.octet_count & 0xFFFFFFFF,
        )
        body += b"".join(r.to_bytes() for r in self.reports)
        return _header(PT_SR, len(self.reports), body)


@dataclass
class ReceiverReport:
    ssrc: int
    reports: List[ReportBlock] = field(default_factory=list)

    def to_bytes(self) -> bytes:
        body = struct.pack(">I", self.ssrc)
        body += b"".join(r.to_bytes() for r in self.reports)
        return _header(PT_RR, len(self.reports), body)


@dataclass
class Sdes:
    ssrc: int
    cname: str

    def to_bytes(self) -> bytes:
        cname = self.cname.encode()
        item = struct.pack(">IBB", self.ssrc, 1, len(cname)) + cname
        pad = (4 - (len(item) + 1) % 4) % 4  # +1 for the terminating zero
        return _header(PT_SDES, 1, item + b"\x00" * (pad + 1))


@dataclass
class Bye:
    ssrcs: List[int]
    reason: str = ""

    def to_bytes(self) -> bytes:
        body = b"".join(struct.pack(">I", s) for s in self.ssrcs)
        if self.reason:
            r = self.reason.encode()
            body += bytes([len(r)]) + r
            body += b"\x00" * ((4 - len(body) % 4) % 4)
        return _header(PT_BYE, len(self.ssrcs), body)


Packet = Union[SenderReport, ReceiverReport, Sdes, Bye]


def parse_compound(data: bytes) -> List[Packet]:
    out: List[Packet] = []
    pos = 0
    while pos + 4 <= len(data):
        b0, pt, words = struct.unpack_from(">BBH", data, pos)
        if b0 >> 6 != 2:
            raise ValueError(f"bad RTCP version at {pos}")
        count = b0 & 0x1F
        end = pos + 4 + 4 * words
        body = data[pos + 4 : end]
        if pt == PT_SR:
            ssrc, ntp, rtpts, pc, oc = struct.unpack_from(">IQIII", body)
            reports = [ReportBlock.parse(body[24 + 24 * i :]) for i in range(count)]
            out.append(SenderReport(ssrc, ntp, rtpts, pc, oc, reports))
        elif pt == PT_RR:
            (ssrc,) = struct.unpack_from(">I", body)
            reports = [ReportBlock.parse(body[4 + 24 * i :]) for i in range(count)]
            out.append(ReceiverReport(ssrc, reports))
        elif pt == PT_SDES and count >= 1:
            ssrc, item_type, length = struct.unpack_from(">IBB", body)
            cname = body[6 : 6 + length].decode(errors="replace") if item_type == 1 else ""
            out.append(Sdes(ssrc, cname))
        elif pt == PT_BYE:
            ssrcs = list(struct.unpack_from(f">{count}I", body))
            reason = ""
            if len(body) > 4 * count:
                rlen = body[4 * count]
                reason = body[4 * count + 1 : 4 * count + 1 + rlen].decode(errors="replace")
            out.append(Bye(ssrcs, reason))
        pos = end
    return out


__all__ = [
    "SenderReport", "ReceiverReport", "ReportBlock", "Sdes", "Bye",
    "parse_compound", "ntp_from_ns",
    "PT_SR", "PT_RR", "PT_SDES", "PT_BYE",
]
