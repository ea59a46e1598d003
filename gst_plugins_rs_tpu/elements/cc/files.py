"""Caption file formats: sccparse / sccenc (Scenarist SCC) and
mccparse / mccenc (MacCaption MCC).

Parity targets: video/closedcaption/src/scc_parse, scc_enc, mcc_parse,
mcc_enc.  SCC lines are `HH:MM:SS:FF<TAB>9420 9420 ...` hex pairs;
MCC payload lines use the single-character run aliases expanded by the
reference parser (mcc_parse/parser.rs:130-199: G..O = 1..9 repetitions of
the `fa 00 00` padding triplet, P/Q/R = fb/fc/fd 80 80, S = 96 69,
T = 61 01, U = e1 00 00 00, Z = 00).

MCC caption lines carry an SMPTE 291 ANC data packet (DID 0x61 SDID 0x01)
whose user words are a CDP (SMPTE 334-2) with the cc_data triplets — the
framing visible in the reference parser's own test vector
(mcc_parse/parser.rs test_caption).  mccenc writes that full framing
(ANC header + CDP + 8-bit-truncated ANC checksum); mccparse unwraps it and
also accepts raw cc_data triplet lines.
"""
from __future__ import annotations

from fractions import Fraction
from typing import List, Optional

import numpy as np

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
    PadDirection,
    Prop,
    SECOND,
    TransformMode,
    register,
)
from .elements import CEA608_CAPS, pairs_to_array

SCC_CAPS = Caps.builder("application/x-scc")
MCC_CAPS = Caps.builder("application/x-mcc", version=1)

SCC_HEADER = "Scenarist_SCC V1.0"


def _tc_to_ns(tc: str, fps: Fraction) -> int:
    drop = ";" in tc
    parts = tc.replace(";", ":").split(":")
    h, m, s, f = (int(p) for p in parts)
    fpsec = int(round(float(fps)))  # timecode counts f at the rounded rate
    frame_num = ((h * 60 + m) * 60 + s) * fpsec + f
    if drop:
        # drop-frame: 2 frames dropped per minute except every 10th
        total_min = h * 60 + m
        frame_num -= 2 * (total_min - total_min // 10)
    return frame_num * SECOND * fps.denominator // fps.numerator


def _ns_to_tc(ns: int, fps: Fraction) -> str:
    total_frames = ns * fps.numerator // (SECOND * fps.denominator)
    fpsec = int(round(float(fps)))
    f = total_frames % fpsec
    s = total_frames // fpsec
    return f"{s // 3600:02d}:{s // 60 % 60:02d}:{s % 60:02d}:{f:02d}"


def _text_of(buf: Buffer) -> str:
    d = buf.data
    if isinstance(d, str):
        return d
    return np.asarray(d, np.uint8).tobytes().decode("utf-8", errors="replace")


class _FileParseBase(BaseTransform):
    """Byte-stream in (rsfilesrc-style), caption pair buffers out."""

    MODE = TransformMode.NEVER_IN_PLACE
    SRC_CAPS = CEA608_CAPS

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._acc = ""

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._acc = ""

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (CEA608_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def parse_line(self, line: str) -> Optional[Buffer]:
        raise NotImplementedError

    def generate_output(self) -> Optional[Buffer]:
        inbuf = self.take_queued_buffer()
        if inbuf is not None:
            self._acc += _text_of(inbuf)
        while "\n" in self._acc:
            line, self._acc = self._acc.split("\n", 1)
            out = self.parse_line(line.rstrip("\r"))
            if out is not None:
                return out
        return None

    def drain(self) -> Optional[Buffer]:
        if self._acc.strip():
            line, self._acc = self._acc, ""
            return self.parse_line(line.strip())
        return None


@register
class SccParse(_FileParseBase):
    ELEMENT_NAME = "sccparse"
    ELEMENT_CLASS = "Parser/ClosedCaption"
    ELEMENT_DESCRIPTION = "Parses SCC files into CEA-608 byte pairs"
    SINK_CAPS = SCC_CAPS
    PROPERTIES = [Prop("framerate", "30000/1001", type="str")]

    def parse_line(self, line: str) -> Optional[Buffer]:
        line = line.strip()
        if not line or line.startswith(SCC_HEADER):
            return None
        tc, _, payload = line.partition("\t")
        if not payload:
            tc, _, payload = line.partition(" ")
        fps = Fraction(self.get_property("framerate"))
        words = payload.split()
        pairs = [(int(w[:2], 16), int(w[2:], 16)) for w in words if len(w) == 4]
        if not pairs:
            return None
        pts = _tc_to_ns(tc, fps)
        buf = Buffer(pairs_to_array(pairs), pts=pts)
        buf.duration = len(pairs) * SECOND * fps.denominator // fps.numerator
        return buf


@register
class SccEnc(BaseTransform):
    ELEMENT_NAME = "sccenc"
    ELEMENT_CLASS = "Encoder/ClosedCaption"
    ELEMENT_DESCRIPTION = "Encodes CEA-608 byte pairs into SCC"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = CEA608_CAPS
    SRC_CAPS = SCC_CAPS
    PROPERTIES = [
        Prop("framerate", "30000/1001", type="str"),
        Prop("output-padding", True, type="bool",
             doc="encode padding (0x8080) pairs received from upstream; "
                 "false strips them from the output words"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sent_header = False

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._sent_header = False

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (SCC_CAPS if direction == PadDirection.SINK else CEA608_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        fps = Fraction(self.get_property("framerate"))
        pairs = np.asarray(inbuf.data, np.uint8).reshape(-1, 2)
        if not self.get_property("output-padding"):
            pairs = pairs[~((pairs[:, 0] == 0x80) & (pairs[:, 1] == 0x80))]
        words = " ".join(f"{hi:02x}{lo:02x}" for hi, lo in pairs)
        line = f"{_ns_to_tc(inbuf.pts or 0, fps)}\t{words}\n\n"
        if not self._sent_header:
            line = f"{SCC_HEADER}\n\n" + line
            self._sent_header = True
        return Buffer(line, pts=inbuf.pts, duration=inbuf.duration)


# MCC alias table (mcc_parse/parser.rs:130-199)
_MCC_ALIASES = {
    **{chr(ord("G") + i): bytes([0xFA, 0x00, 0x00]) * (i + 1) for i in range(9)},
    "P": bytes([0xFB, 0x80, 0x80]),
    "Q": bytes([0xFC, 0x80, 0x80]),
    "R": bytes([0xFD, 0x80, 0x80]),
    "S": bytes([0x96, 0x69]),
    "T": bytes([0x61, 0x01]),
    "U": bytes([0xE1, 0x00, 0x00, 0x00]),
    "Z": bytes([0x00]),
}

MCC_HEADER = "File Format=MacCaption_MCC V1.0"


def mcc_decode_payload(s: str) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c in _MCC_ALIASES:
            out += _MCC_ALIASES[c]
            i += 1
        else:
            out.append(int(s[i : i + 2], 16))
            i += 2
    return bytes(out)


def mcc_encode_payload(data: bytes) -> str:
    """Greedy alias compression: longest padding runs first, then the
    single-sequence aliases, then plain hex."""
    out = []
    i = 0
    pad = bytes([0xFA, 0x00, 0x00])
    while i < len(data):
        if data[i : i + 3] == pad:
            n = 1
            while n < 9 and data[i + 3 * n : i + 3 * (n + 1)] == pad:
                n += 1
            out.append(chr(ord("G") + n - 1))
            i += 3 * n
            continue
        for alias in ("P", "Q", "R", "S", "T", "U", "Z"):
            seq = _MCC_ALIASES[alias]
            if data[i : i + len(seq)] == seq:
                out.append(alias)
                i += len(seq)
                break
        else:
            out.append(f"{data[i]:02X}")
            i += 1
    return "".join(out)


@register
class MccParse(_FileParseBase):
    ELEMENT_NAME = "mccparse"
    ELEMENT_CLASS = "Parser/ClosedCaption"
    ELEMENT_DESCRIPTION = "Parses MCC files into CEA-608 byte pairs"
    SINK_CAPS = MCC_CAPS
    PROPERTIES = [Prop("framerate", "30000/1001", type="str")]

    def parse_line(self, line: str) -> Optional[Buffer]:
        line = line.strip()
        if not line or line.startswith(("File Format", "//", "UUID", "Creation",
                                        "Code Rate", "Time Code Rate")):
            return None
        tc, _, payload = line.partition("\t")
        if not payload:
            return None
        data = mcc_decode_payload(payload.strip())
        # full framing: ANC packet (DID 0x61 SDID 0x01) wrapping a CDP
        if len(data) > 3 and data[0] == 0x61 and data[1] == 0x01:
            from ...ops import cea708

            dc = data[2]
            cdp = data[3 : 3 + dc]
            try:
                data, _seq = cea708.parse_cdp(cdp)
            except ValueError:
                return None
        # extract 608 field-1 pairs from cc_data triplets (cc_type 0 marker
        # 0xfc with cc_valid set)
        pairs: List = []
        for j in range(0, len(data) - 2, 3):
            if data[j] == 0xFC:
                pairs.append((data[j + 1], data[j + 2]))
        if not pairs:
            return None
        fps = Fraction(self.get_property("framerate"))
        return Buffer(pairs_to_array(pairs), pts=_tc_to_ns(tc, fps))


@register
class MccEnc(BaseTransform):
    ELEMENT_NAME = "mccenc"
    ELEMENT_CLASS = "Encoder/ClosedCaption"
    ELEMENT_DESCRIPTION = "Encodes CEA-608 byte pairs into MCC"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = CEA608_CAPS
    SRC_CAPS = MCC_CAPS
    PROPERTIES = [
        Prop("framerate", "30000/1001", type="str"),
        Prop("uuid", None, type="str",
             doc="UUID written in the header (None = fresh uuid4)"),
        Prop("creation-date", None, type="str",
             doc="creation date/time for the header, ISO 8601 "
                 "(None = now)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sent_header = False

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._sent_header = False

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (MCC_CAPS if direction == PadDirection.SINK else CEA608_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def __init_seq(self) -> int:
        seq = getattr(self, "_cdp_seq", 0)
        self._cdp_seq = (seq + 1) & 0xFFFF
        return seq

    @staticmethod
    def _anc_wrap(cdp: bytes) -> bytes:
        """ANC packet bytes as MCC stores them: DID, SDID, DC, UDWs and the
        low 8 bits of the SMPTE 291 checksum over the parity-extended words
        (matches the reference parser's caption test vector)."""
        from ...ops.st2038 import _parity10

        words = [_parity10(0x61), _parity10(0x01), _parity10(len(cdp))]
        words += [_parity10(b) for b in cdp]
        checksum = sum(w & 0x1FF for w in words) & 0x1FF
        return bytes([0x61, 0x01, len(cdp)]) + cdp + bytes([checksum & 0xFF])

    def transform(self, inbuf: Buffer) -> Buffer:
        from ...ops import cea708

        fps = Fraction(self.get_property("framerate"))
        pairs = np.asarray(inbuf.data, np.uint8).reshape(-1, 2)
        # cc_data: the 608 pairs as field-1 triplets, padded with DTVCC
        # filler to the frame-rate-appropriate 20-triplet budget
        cc = b"".join(bytes([0xFC, hi, lo]) for hi, lo in pairs)
        while len(cc) // 3 < 20:
            cc += bytes([0xFA, 0x00, 0x00])
        cdp = cea708.build_cdp(cc, sequence=self.__init_seq(),
                               fps=int(round(float(fps))))
        line = f"{_ns_to_tc(inbuf.pts or 0, fps)}\t{mcc_encode_payload(self._anc_wrap(cdp))}\n"
        if not self._sent_header:
            import uuid as _uuid
            from datetime import datetime, timezone

            uid = self.get_property("uuid") or str(_uuid.uuid4()).upper()
            created = self.get_property("creation-date") or \
                datetime.now(timezone.utc).strftime("%a, %b %d, %Y %H:%M:%S")
            line = (f"{MCC_HEADER}\n//\nUUID={uid}\n"
                    f"Creation Date={created}\n"
                    f"Time Code Rate=30DF\n\n") + line
            self._sent_header = True
        return Buffer(line, pts=inbuf.pts, duration=inbuf.duration)


__all__ = ["SccParse", "SccEnc", "MccParse", "MccEnc",
           "mcc_decode_payload", "mcc_encode_payload"]
