"""raptorqenc / raptorqdec: forward error correction for RTP streams.

Parity target: net/raptorq (raptorqenc/imp.rs:29; props protected-packets,
repair-packets, repair-window, symbol-size, mtu, pt).  Media RTP packets
pass through unchanged; every `protected-packets` block yields
`repair-packets` repair packets on the `fec_0` src pad, and the decoder
reconstructs lost media packets from any sufficient subset (systematic
fountain code over GF(256), net/fountain.py — recovery property of
RFC 6330 without its precomputed tables; wire format is this framework's
own, documented there).

Repair packet payload: block_seq u16 | base_seq u16 | K u8 | row u8 |
symbol_len u16 | repair symbol.  Source symbols are the full RTP packet
bytes, length-prefixed and zero-padded to the block's symbol length.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...core import (
    Buffer,
    Caps,
    Element,
    Event,
    EventType,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    register,
)
from ...core.events import Segment
from ...net import fountain
from ...net.rtp import RtpPacket

RTP_CAPS = Caps.builder("application/x-rtp")
FEC_CAPS = Caps.builder("application/x-rtp-fec")
HDR = struct.Struct(">HHBBH")


@register
class RaptorqEnc(Element):
    ELEMENT_NAME = "raptorqenc"
    EXTRA_PAD_TEMPLATES = [
        ('fec_%u', 'src', 'sometimes', 'application/x-rtp-fec'),
    ]
    ELEMENT_CLASS = "Network/FEC"
    ELEMENT_DESCRIPTION = "Adds fountain-code repair packets to an RTP stream"
    PROPERTIES = [
        Prop("protected-packets", 10, type="uint", minimum=1, maximum=255),
        Prop("repair-packets", 2, type="uint", minimum=1, maximum=255),
        Prop("mtu", 1400, type="uint", minimum=1, maximum=9216,
             doc="expected upper bound on media packet size; symbols are "
                 "sized so a repair packet stays under it"),
        Prop("pt", 97, type="uint", minimum=96, maximum=255,
             doc="payload type stamped on repair packets"),
        Prop("repair-window", 50_000_000, type="uint64",
             doc="ns over which repair packets for a block are spread"),
        Prop("symbol-size", 1408, type="uint", minimum=1, maximum=9216,
             doc="fountain symbol size in bytes (packets are zero-padded "
                 "to whole symbols)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, RTP_CAPS))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, RTP_CAPS))
        )
        self.fecpad = self.add_pad(
            Pad("fec_0", PadDirection.SRC,
                PadTemplate("fec_%u", PadDirection.SRC, PadPresence.SOMETIMES, FEC_CAPS))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._block: List[Tuple[int, bytes]] = []
        self._block_seq = 0
        self._fec_started = False

    def on_ready_to_paused(self) -> None:
        self._block = []
        self._block_seq = 0
        self._fec_started = False

    def _emit_repair(self, pts) -> None:
        if not self._block:
            return
        k = len(self._block)
        base_seq = self._block[0][0]
        # symbol-size caps the padded symbol; actual packets may force a
        # larger one (a symbol must hold the biggest protected packet)
        symbol_len = max(len(d) for _s, d in self._block) + 2
        symbol_len = max(symbol_len,
                         min(self.get_property("symbol-size"),
                             self.get_property("mtu")))
        symbols = []
        for _seq, data in self._block:
            sym = struct.pack(">H", len(data)) + data
            symbols.append(sym + b"\x00" * (symbol_len - len(sym)))
        repairs = fountain.encode_repair(
            symbols, self.get_property("repair-packets"),
            seed=self._block_seq & 0xFFFF,  # the header carries 16 bits
        )
        if not self._fec_started and self.fecpad.peer is not None:
            self._fec_started = True
            self.fecpad.push_event(Event.new_stream_start(f"{self.name}-fec"))
            self.fecpad.push_event(Event.new_caps(FEC_CAPS))
            self.fecpad.push_event(Event.new_segment(Segment()))
        for row, sym in enumerate(repairs):
            payload = HDR.pack(self._block_seq & 0xFFFF, base_seq, k, row, symbol_len) + sym
            if self.fecpad.peer is not None:
                self.fecpad.push(Buffer(np.frombuffer(payload, np.uint8), pts=pts))
        self._block = []
        self._block_seq += 1

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        data = np.asarray(buf.data, np.uint8).tobytes()
        seq = RtpPacket.parse(data).sequence_number
        self._block.append((seq, data))
        ret = self.srcpad.push(buf)
        if len(self._block) >= self.get_property("protected-packets"):
            self._emit_repair(buf.pts)
        return ret

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.EOS:
            self._emit_repair(None)
            if self.fecpad.peer is not None:
                self.fecpad.push_event(event)
        return self.srcpad.push_event(event)


class _BlockState:
    def __init__(self, k: int, symbol_len: int, base_seq: int):
        self.k = k
        self.symbol_len = symbol_len
        self.base_seq = base_seq
        self.source: Dict[int, bytes] = {}
        self.repair: Dict[int, bytes] = {}
        self.done = False


@register
class RaptorqDec(Element):
    ELEMENT_NAME = "raptorqdec"
    EXTRA_PAD_TEMPLATES = [
        ('fec_%u', 'sink', 'request', 'application/x-rtp-fec'),
    ]
    ELEMENT_CLASS = "Network/FEC"
    ELEMENT_DESCRIPTION = "Recovers lost RTP packets from fountain-code repair packets"
    PROPERTIES = [
        Prop("repair-window", 64, type="uint", doc="blocks kept for recovery"),
        Prop("repair-window-tolerance", 500_000, type="uint64",
             doc="extra ns tolerated beyond the sender's repair window "
                 "before a block is abandoned"),
        Prop("media-packets-reset-threshold", 200, type="uint",
             doc="seqnum jump (in packets) that resets the decoder state "
                 "(stream restart detection); 0 = never"),
        Prop("stats", None, type="object",
             doc="(read) recovered/received/buffered counters"),
    ]

    def get_property(self, name: str):
        if name == "stats":
            from ...core.caps import Structure

            return Structure(
                "raptorqdec-stats",
                **{"recovered": self.num_recovered,
                   "buffered-blocks": len(self._blocks),
                   "seen-packets": len(self._seen)})
        return super().get_property(name)

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, RTP_CAPS))
        )
        self.fecpad = self.add_pad(
            Pad("fec_0", PadDirection.SINK,
                PadTemplate("fec_%u", PadDirection.SINK, PadPresence.REQUEST, FEC_CAPS))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, RTP_CAPS))
        )
        self.sinkpad.chain_function = self._media_chain
        self.sinkpad.event_function = lambda pad, ev: self.srcpad.push_event(ev)
        self.fecpad.chain_function = self._fec_chain
        self.fecpad.event_function = lambda pad, ev: True
        self._blocks: Dict[int, _BlockState] = {}
        self._seen: Dict[int, bytes] = {}  # seq -> packet (recent window)
        self.num_recovered = 0

    def on_ready_to_paused(self) -> None:
        self._blocks = {}
        self._seen = {}
        self.num_recovered = 0

    def _media_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        data = np.asarray(buf.data, np.uint8).tobytes()
        seq = RtpPacket.parse(data).sequence_number
        # stream-restart detection: a seq jump past the threshold resets
        # the decoder state instead of poisoning pending blocks
        thr = self.get_property("media-packets-reset-threshold")
        last = getattr(self, "_last_seq", None)
        if thr and last is not None:
            dist = (seq - last) & 0xFFFF
            if thr < dist < 0x8000:
                self._blocks.clear()
                self._seen.clear()
        self._last_seq = seq
        self._seen[seq] = data
        # register into any block covering this seq
        for blk in self._blocks.values():
            idx = (seq - blk.base_seq) & 0xFFFF
            if idx < blk.k:
                sym = struct.pack(">H", len(data)) + data
                blk.source[idx] = sym + b"\x00" * (blk.symbol_len - len(sym))
        return self.srcpad.push(buf)

    def _fec_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        payload = np.asarray(buf.data, np.uint8).tobytes()
        block_seq, base_seq, k, row, symbol_len = HDR.unpack_from(payload)
        blk = self._blocks.get(block_seq)
        if blk is None:
            blk = _BlockState(k, symbol_len, base_seq)
            # backfill sources already seen
            for i in range(k):
                seq = (base_seq + i) & 0xFFFF
                if seq in self._seen:
                    data = self._seen[seq]
                    sym = struct.pack(">H", len(data)) + data
                    blk.source[i] = sym + b"\x00" * (symbol_len - len(sym))
            self._blocks[block_seq] = blk
            while len(self._blocks) > self.get_property("repair-window"):
                self._blocks.pop(next(iter(self._blocks)))
        blk.repair[row] = payload[HDR.size :]
        self._try_recover(blk)
        return FlowReturn.OK

    def _try_recover(self, blk: _BlockState) -> None:
        if blk.done or len(blk.source) >= blk.k:
            blk.done = True
            return
        if len(blk.source) + len(blk.repair) < blk.k:
            return
        # decode against the block's seed (= full block counter low 16 bits;
        # encoder/decoder agree since it travels in the header)
        seed = next(bs for bs, b in self._blocks.items() if b is blk)
        symbols = fountain.decode_block(blk.k, blk.symbol_len, blk.source,
                                        blk.repair, seed=seed)
        if symbols is None:
            return
        blk.done = True
        for i, sym in enumerate(symbols):
            if i in blk.source:
                continue
            (length,) = struct.unpack_from(">H", sym)
            data = sym[2 : 2 + length]
            seq = (blk.base_seq + i) & 0xFFFF
            if seq not in self._seen:
                self._seen[seq] = data
                self.num_recovered += 1
                self.srcpad.push(Buffer(np.frombuffer(data, np.uint8)))


__all__ = ["RaptorqEnc", "RaptorqDec"]
