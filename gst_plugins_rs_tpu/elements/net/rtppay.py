"""RTP payloader / depayloader elements.

Parity targets: reference net/rtp base classes RtpBasePay2 / RtpBaseDepay2
(net/rtp/src/basepay/imp.rs 2223 LoC, basedepay/) and the codec-free pairs:
- rtppcmapay2/rtppcmupay2 + depay (RFC 3551 G.711, pcmau/pay/imp.rs:37-59)
- rtpL8pay2/rtpL16pay2 + depay (RFC 3551 linear audio,
  linear_audio/pay/imp.rs:60-108; L16 is big-endian on the wire)
- rtpklvpay2/rtpklvdepay2 (RFC 6597 SMPTE 336 KLV metadata, klv/)

Base-class semantics kept from the reference: mtu-bounded packetization
(default_mtu = 1200, basepay/imp.rs:1847), pt/ssrc/timestamp-offset/
seqnum-offset properties with random defaults, RTP time = offset +
pts * clock-rate, marker bit per subclass, seqnum-gap -> DISCONT on depay.
"""
from __future__ import annotations

import random
from collections import deque
from typing import List, Optional

import numpy as np

from ...core import (
    BaseTransform,
    Buffer,
    BufferFlags,
    Caps,
    IntRange,
    PadDirection,
    Prop,
    SECOND,
    TransformMode,
    register,
)
from ...core.caps import Structure
from ...net.rtp import RtpPacket, SeqnumTracker, TimestampTracker

U32 = 0xFFFFFFFF
U16 = 0xFFFF
RTP_CAPS = Caps([Structure("application/x-rtp")])


class RtpBasePay(BaseTransform):
    """Payloader base: input media buffers -> application/x-rtp packet buffers."""

    MODE = TransformMode.NEVER_IN_PLACE
    SRC_CAPS = RTP_CAPS
    DEFAULT_PT = 96
    PROPERTIES = [
        Prop("mtu", 1200, type="uint", minimum=28, doc="max total packet size (basepay default_mtu)"),
        Prop("pt", -1, type="int", minimum=-1, maximum=127, doc="-1 = class default"),
        Prop("ssrc", -1, type="int", minimum=-1, maximum=U32, doc="-1 = random"),
        Prop("timestamp-offset", -1, type="int", minimum=-1, maximum=U32, doc="-1 = random"),
        Prop("seqnum-offset", -1, type="int", minimum=-1, maximum=U16, doc="-1 = random"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._packets: deque = deque()
        self.clock_rate = 0
        self._seqnum = 0
        self._ssrc = 0
        self._ts_base = 0

    # -- subclass hooks ------------------------------------------------------
    def rtp_structure(self, s: Structure) -> Structure:
        """Map fixed sink caps structure -> application/x-rtp structure."""
        raise NotImplementedError

    def handle_buffer(self, buf: Buffer) -> None:
        """Convert one input buffer into queue_packet() calls."""
        raise NotImplementedError

    # -- negotiation ----------------------------------------------------------
    def pt(self) -> int:
        p = self.get_property("pt")
        return self.DEFAULT_PT if p < 0 else p

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        if direction == PadDirection.SINK:
            if caps.is_any():
                out = RTP_CAPS.copy()
            else:
                structs = []
                for s in caps.structures:
                    if s.is_fixed():
                        r = self.rtp_structure(s)
                        r["payload"] = self.pt()
                        structs.append(r)
                    else:
                        structs.append(Structure("application/x-rtp"))
                out = Caps(structs)
        else:
            out = self.SINK_CAPS.copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        self.clock_rate = outcaps.structure(0)["clock-rate"]

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._packets.clear()
        ssrc = self.get_property("ssrc")
        self._ssrc = random.getrandbits(32) if ssrc < 0 else ssrc
        seq = self.get_property("seqnum-offset")
        self._seqnum = random.getrandbits(16) if seq < 0 else seq
        ts = self.get_property("timestamp-offset")
        self._ts_base = random.getrandbits(32) if ts < 0 else ts

    # -- packet production -------------------------------------------------------
    def rtp_time(self, pts: Optional[int]) -> int:
        base = self._ts_base
        if pts is None:
            return base & U32
        return (base + pts * self.clock_rate // SECOND) & U32

    def queue_packet(
        self,
        payload: bytes,
        *,
        pts: Optional[int],
        duration: Optional[int] = None,
        marker: bool = False,
    ) -> None:
        pkt = RtpPacket(
            payload_type=self.pt(),
            sequence_number=self._seqnum,
            timestamp=self.rtp_time(pts),
            ssrc=self._ssrc,
            payload=payload,
            marker=marker,
        )
        self._seqnum = (self._seqnum + 1) & U16
        self._packets.append(
            Buffer(np.frombuffer(pkt.to_bytes(), np.uint8), pts=pts, duration=duration)
        )

    def max_payload_size(self) -> int:
        return self.get_property("mtu") - 12

    def generate_output(self) -> Optional[Buffer]:
        if not self._packets:
            buf = self.take_queued_buffer()
            if buf is None:
                return None
            self.handle_buffer(buf)
        return self._packets.popleft() if self._packets else None


AGGREGATE_PROPS = [
    Prop("aggregate-mode", "auto", type="enum",
         choices=["auto", "zero-latency", "aggregate"],
         doc="whether multiple frames share one packet: zero-latency "
             "sends each frame immediately, aggregate packs frames until "
             "mtu/max-ptime; auto resolves to zero-latency here (the "
             "live-safe choice — the reference aggregates for non-live "
             "sessions)"),
    Prop("max-ptime", -1, type="int", minimum=-1,
         doc="maximum duration (ns) of media per packet when aggregating "
             "(-1 = bound by mtu only)"),
]


class RtpAggregateMixin:
    """Frame aggregation for payloaders whose wire format packs several
    complete frames per packet (RFC 4184 AC-3, RFC 2250 MPA, RFC 3640,
    RFC 4867).  Subclasses implement flush_frames(frames) -> queue_packet
    calls and call aggregate_frame() from handle_buffer."""

    def __init__(self, name=None):
        super().__init__(name)
        self._agg: List[tuple] = []  # (frame_bytes, pts, duration)

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._agg = []

    def _aggregating(self) -> bool:
        return self.get_property("aggregate-mode") == "aggregate"

    def flush_frames(self, frames: List[tuple]) -> None:
        raise NotImplementedError

    def _agg_flush(self) -> None:
        if self._agg:
            frames, self._agg = self._agg, []
            self.flush_frames(frames)

    def aggregate_frame(self, frame: bytes, pts, duration,
                        per_frame_overhead: int = 0,
                        base_overhead: int = 0) -> None:
        if not self._aggregating():
            self.flush_frames([(frame, pts, duration)])
            return
        maxp = self.max_payload_size() - base_overhead
        size = sum(len(f) + per_frame_overhead for f, _, _ in self._agg)
        dur = sum(d or 0 for _, _, d in self._agg)
        max_ptime = self.get_property("max-ptime")
        if self._agg and (
                size + len(frame) + per_frame_overhead > maxp
                or (max_ptime >= 0 and dur + (duration or 0) > max_ptime)):
            self._agg_flush()
        self._agg.append((frame, pts, duration))
        size = sum(len(f) + per_frame_overhead for f, _, _ in self._agg)
        dur = sum(d or 0 for _, _, d in self._agg)
        if size >= maxp or (max_ptime >= 0 and dur >= max_ptime):
            self._agg_flush()

    def drain(self) -> Optional[Buffer]:
        """EOS: flush pending aggregation. All but the last flushed packet
        push directly (drain's contract returns one residue buffer)."""
        self._agg_flush()
        while len(self._packets) > 1:
            self.srcpad.push(self._packets.popleft())
        return self._packets.popleft() if self._packets else None


class RtpBaseAudioPay(RtpBasePay):
    """Audio payloader: splits constant-bpf streams at MTU boundaries
    (reference baseaudiopay/)."""

    BPF_FROM_CAPS = True  # bpf = bytes-per-frame of the wire format

    def bpf(self) -> int:
        raise NotImplementedError

    def payload_bytes(self, buf: Buffer) -> bytes:
        """Wire-format bytes for the buffer's payload."""
        raise NotImplementedError

    def handle_buffer(self, buf: Buffer) -> None:
        data = self.payload_bytes(buf)
        bpf = self.bpf()
        frames_total = len(data) // bpf
        max_frames = max(self.max_payload_size() // bpf, 1)
        pos = 0
        while pos < frames_total:
            n = min(max_frames, frames_total - pos)
            pts = None
            if buf.pts is not None:
                pts = buf.pts + pos * SECOND // self.clock_rate
            self.queue_packet(
                data[pos * bpf : (pos + n) * bpf],
                pts=pts,
                duration=n * SECOND // self.clock_rate,
            )
            pos += n


class RtpBaseDepay(BaseTransform):
    """Depayloader base: application/x-rtp packets -> media buffers."""

    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = RTP_CAPS

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.clock_rate = 0
        self._seq = SeqnumTracker()
        self._ts = TimestampTracker()
        self._first_ext_ts: Optional[int] = None

    # -- subclass hooks -------------------------------------------------------
    def media_structure(self, s: Structure) -> Structure:
        """Map fixed application/x-rtp structure -> output media structure."""
        raise NotImplementedError

    def depay(self, packet: RtpPacket, out: Buffer) -> Optional[Buffer]:
        """Convert one RTP packet to an output buffer (None = consumed,
        e.g. while accumulating fragments)."""
        raise NotImplementedError

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        if direction == PadDirection.SINK:
            structs = []
            for s in caps.structures:
                structs.append(self.media_structure(s) if s.is_fixed() else
                               self.SRC_CAPS.structures[0].copy())
            out = Caps(structs) if not caps.is_any() else self.SRC_CAPS.copy()
        else:
            out = RTP_CAPS.copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def set_caps(self, incaps: Caps, outcaps: Caps) -> None:
        # clock-rate is mandatory in well-formed rtp caps; tolerate its
        # absence (raw udpsrc relinks) by falling back to the 90 kHz default
        self.clock_rate = incaps.structure(0).get("clock-rate", 90000)

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._seq = SeqnumTracker()
        self._ts = TimestampTracker()
        self._first_ext_ts = None

    def transform(self, inbuf: Buffer) -> Optional[Buffer]:
        pkt = RtpPacket.parse(np.asarray(inbuf.data).tobytes())
        _ext, gap = self._seq.update(pkt.sequence_number)
        ext_ts = self._ts.update(pkt.timestamp)
        if self._first_ext_ts is None:
            self._first_ext_ts = ext_ts
        pts = inbuf.pts
        if pts is None and self.clock_rate:
            pts = (ext_ts - self._first_ext_ts) * SECOND // self.clock_rate
        out = Buffer(None, pts=pts, duration=inbuf.duration)
        if gap != 1:
            out.set_flag(BufferFlags.DISCONT)
        return self.depay(pkt, out)


# ---------------------------------------------------------------------------
# G.711 PCMA / PCMU (RFC 3551; reference pcmau/)
# ---------------------------------------------------------------------------
class _PcmauPay(RtpBaseAudioPay):
    MEDIA = ""
    ENCODING = ""

    def rtp_structure(self, s: Structure) -> Structure:
        # pt 0/8 are the static 8 kHz assignments (pcmau/pay/imp.rs:66-72)
        ch = s.get("channels", 1)
        return Structure(
            "application/x-rtp",
            media="audio",
            **{"encoding-name": self.ENCODING, "clock-rate": s["rate"],
               "encoding-params": str(ch)},
        )

    def bpf(self) -> int:
        return self.in_caps.structure(0).get("channels", 1)

    def payload_bytes(self, buf: Buffer) -> bytes:
        arr = np.asarray(buf.data, dtype=np.uint8)
        return arr.tobytes()


class _PcmauDepay(RtpBaseDepay):
    MEDIA = ""

    def media_structure(self, s: Structure) -> Structure:
        channels = int(s.get("encoding-params", "1"))
        return Structure(self.MEDIA, rate=s["clock-rate"], channels=channels)

    def depay(self, pkt: RtpPacket, out: Buffer) -> Buffer:
        ch = self.out_caps.structure(0)["channels"]
        arr = np.frombuffer(pkt.payload, np.uint8).reshape(-1, ch)
        out.data = arr
        if out.duration is None and self.clock_rate:
            out.duration = arr.shape[0] * SECOND // self.clock_rate
        return out


@register
class RtpPcmaPay(_PcmauPay):
    ELEMENT_NAME = "rtppcmapay2"
    ELEMENT_CLASS = "Codec/Payloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Payload A-law audio into RTP packets (RFC 3551)"
    MEDIA = "audio/x-alaw"
    ENCODING = "PCMA"
    DEFAULT_PT = 8
    SINK_CAPS = Caps([Structure("audio/x-alaw", rate=IntRange(1, 2_822_400), channels=IntRange(1, 64))])


@register
class RtpPcmuPay(_PcmauPay):
    ELEMENT_NAME = "rtppcmupay2"
    ELEMENT_CLASS = "Codec/Payloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Payload mu-law audio into RTP packets (RFC 3551)"
    MEDIA = "audio/x-mulaw"
    ENCODING = "PCMU"
    DEFAULT_PT = 0
    SINK_CAPS = Caps([Structure("audio/x-mulaw", rate=IntRange(1, 2_822_400), channels=IntRange(1, 64))])


@register
class RtpPcmaDepay(_PcmauDepay):
    ELEMENT_NAME = "rtppcmadepay2"
    ELEMENT_CLASS = "Codec/Depayloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Depayload A-law audio from RTP packets (RFC 3551)"
    MEDIA = "audio/x-alaw"
    SRC_CAPS = Caps([Structure("audio/x-alaw", rate=IntRange(1, 2_822_400), channels=IntRange(1, 64))])


@register
class RtpPcmuDepay(_PcmauDepay):
    ELEMENT_NAME = "rtppcmudepay2"
    ELEMENT_CLASS = "Codec/Depayloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Depayload mu-law audio from RTP packets (RFC 3551)"
    MEDIA = "audio/x-mulaw"
    SRC_CAPS = Caps([Structure("audio/x-mulaw", rate=IntRange(1, 2_822_400), channels=IntRange(1, 64))])


# ---------------------------------------------------------------------------
# Linear audio L8 / L16 (RFC 3551; reference linear_audio/)
# ---------------------------------------------------------------------------
@register
class RtpL8Pay(RtpBaseAudioPay):
    ELEMENT_NAME = "rtpL8pay2"
    ELEMENT_CLASS = "Codec/Payloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Payload 8-bit raw audio (L8) into RTP packets (RFC 3551)"
    SINK_CAPS = Caps([Structure("audio/x-raw", format="U8",
                                rate=IntRange(1, 2_822_400), channels=IntRange(1, 64),
                                layout="interleaved")])

    def rtp_structure(self, s: Structure) -> Structure:
        return Structure(
            "application/x-rtp", media="audio",
            **{"encoding-name": "L8", "clock-rate": s["rate"],
               "channels": s["channels"], "encoding-params": str(s["channels"])},
        )

    def bpf(self) -> int:
        return self.in_caps.structure(0)["channels"]

    def payload_bytes(self, buf: Buffer) -> bytes:
        return np.asarray(buf.data, dtype=np.uint8).tobytes()


@register
class RtpL16Pay(RtpBaseAudioPay):
    ELEMENT_NAME = "rtpL16pay2"
    ELEMENT_CLASS = "Codec/Payloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Payload 16-bit raw audio (L16) into RTP packets (RFC 3551)"
    # reference takes S16BE (linear_audio/pay/imp.rs:74); payloads here are
    # native [frames, ch] int16 arrays, byte-swapped to network order on the wire
    SINK_CAPS = Caps([Structure("audio/x-raw", format="S16",
                                rate=IntRange(1, 2_822_400), channels=IntRange(1, 64),
                                layout="interleaved")])

    def rtp_structure(self, s: Structure) -> Structure:
        # pt 10/11 are the static 44.1 kHz stereo/mono assignments
        # (linear_audio/pay/imp.rs:82-101)
        return Structure(
            "application/x-rtp", media="audio",
            **{"encoding-name": "L16", "clock-rate": s["rate"],
               "channels": s["channels"], "encoding-params": str(s["channels"])},
        )

    def bpf(self) -> int:
        return 2 * self.in_caps.structure(0)["channels"]

    def payload_bytes(self, buf: Buffer) -> bytes:
        return np.asarray(buf.data).astype(">i2").tobytes()


@register
class RtpL8Depay(RtpBaseDepay):
    ELEMENT_NAME = "rtpL8depay2"
    ELEMENT_CLASS = "Codec/Depayloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Depayload 8-bit raw audio (L8) from RTP packets"
    SRC_CAPS = Caps([Structure("audio/x-raw", format="U8",
                               rate=IntRange(1, 2_822_400), channels=IntRange(1, 64),
                               layout="interleaved")])

    def media_structure(self, s: Structure) -> Structure:
        ch = int(s.get("encoding-params", s.get("channels", 1)))
        return Structure("audio/x-raw", format="U8", rate=s["clock-rate"],
                         channels=ch, layout="interleaved")

    def depay(self, pkt: RtpPacket, out: Buffer) -> Buffer:
        ch = self.out_caps.structure(0)["channels"]
        out.data = np.frombuffer(pkt.payload, np.uint8).reshape(-1, ch)
        return out


@register
class RtpL16Depay(RtpBaseDepay):
    ELEMENT_NAME = "rtpL16depay2"
    ELEMENT_CLASS = "Codec/Depayloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Depayload 16-bit raw audio (L16) from RTP packets"
    SRC_CAPS = Caps([Structure("audio/x-raw", format="S16",
                               rate=IntRange(1, 2_822_400), channels=IntRange(1, 64),
                               layout="interleaved")])

    def media_structure(self, s: Structure) -> Structure:
        ch = int(s.get("encoding-params", s.get("channels", 1)))
        return Structure("audio/x-raw", format="S16", rate=s["clock-rate"],
                         channels=ch, layout="interleaved")

    def depay(self, pkt: RtpPacket, out: Buffer) -> Buffer:
        ch = self.out_caps.structure(0)["channels"]
        out.data = np.frombuffer(pkt.payload, ">i2").astype(np.int16).reshape(-1, ch)
        return out


# ---------------------------------------------------------------------------
# KLV metadata (RFC 6597; reference klv/)
# ---------------------------------------------------------------------------
KLV_CAPS = Caps([Structure("meta/x-klv", parsed=True)])


@register
class RtpKlvPay(RtpBasePay):
    ELEMENT_NAME = "rtpklvpay2"
    ELEMENT_CLASS = "Codec/Payloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Payload KLV metadata into RTP packets (RFC 6597)"
    SINK_CAPS = KLV_CAPS

    def rtp_structure(self, s: Structure) -> Structure:
        return Structure(
            "application/x-rtp", media="application",
            **{"encoding-name": "SMPTE336M", "clock-rate": 90000},
        )

    def handle_buffer(self, buf: Buffer) -> None:
        data = np.asarray(buf.data, dtype=np.uint8).tobytes()
        maxp = self.max_payload_size()
        # fragment one KLV unit across packets; marker on the last fragment
        # (RFC 6597 §4.2)
        for pos in range(0, len(data), maxp):
            chunk = data[pos : pos + maxp]
            self.queue_packet(
                chunk, pts=buf.pts, duration=buf.duration,
                marker=pos + maxp >= len(data),
            )


@register
class RtpKlvDepay(RtpBaseDepay):
    ELEMENT_NAME = "rtpklvdepay2"
    ELEMENT_CLASS = "Codec/Depayloader/Network/RTP"
    ELEMENT_DESCRIPTION = "Depayload KLV metadata from RTP packets (RFC 6597)"
    SRC_CAPS = KLV_CAPS

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._acc: List[bytes] = []
        self._acc_pts: Optional[int] = None
        self._broken = False

    def media_structure(self, s: Structure) -> Structure:
        return Structure("meta/x-klv", parsed=True)

    def depay(self, pkt: RtpPacket, out: Buffer) -> Optional[Buffer]:
        if out.has_flag(BufferFlags.DISCONT):
            # lost a fragment: drop the partial unit (reference klv/depay)
            self._acc.clear()
            self._broken = True
        if not self._acc:
            self._acc_pts = out.pts
        self._acc.append(pkt.payload)
        if not pkt.marker:
            return None
        if self._broken:
            self._acc.clear()
            self._broken = False
            return None
        data = b"".join(self._acc)
        self._acc.clear()
        out.data = np.frombuffer(data, np.uint8)
        out.pts = self._acc_pts
        return out


__all__ = [
    "RtpBasePay", "RtpBaseAudioPay", "RtpBaseDepay",
    "RtpPcmaPay", "RtpPcmuPay", "RtpPcmaDepay", "RtpPcmuDepay",
    "RtpL8Pay", "RtpL16Pay", "RtpL8Depay", "RtpL16Depay",
    "RtpKlvPay", "RtpKlvDepay",
]
