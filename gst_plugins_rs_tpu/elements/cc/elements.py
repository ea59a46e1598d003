"""CEA-608 closed-caption text elements: tttocea608, cea608tott,
cea608tojson, tttojson, jsontovtt, ccdetect.

Parity family: video/closedcaption (24 elements, 29.5k LoC).  This module
covers the text<->608 conversion chain; SCC/MCC file formats live in
files.py and the on-video compositor in overlay.py.

Caption byte pairs flow as closedcaption/x-cea-608, format=raw buffers
carrying a [N, 2] uint8 array of pairs (the reference paces one pair per
video frame; here a buffer may carry the whole caption's pairs with pts
spaced by the framerate property — noted divergence, the timing contract
per pair is identical).
"""
from __future__ import annotations

import json
from collections import deque
from fractions import Fraction
from typing import Optional

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
from ...core.caps import Structure
from ...core.events import Message, MessageType
from ...ops import cea608

CEA608_CAPS = Caps.builder("closedcaption/x-cea-608", format="raw")
TEXT_CAPS = Caps.builder("text/x-raw", format="utf8")
JSON_CAPS = Caps.builder("application/x-json")


def pairs_to_array(pairs) -> np.ndarray:
    return np.asarray(pairs, np.uint8).reshape(-1, 2)


@register
class TtToCea608(BaseTransform):
    """text -> CEA-608 byte pairs (reference tttocea608/imp.rs; default mode
    RollUp2, imp.rs:25)."""

    ELEMENT_NAME = "tttocea608"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts timed text to CEA-608 closed captions"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = CEA608_CAPS
    PROPERTIES = [
        Prop("mode", "roll-up2", type="enum",
             choices=["pop-on", "paint-on", "roll-up2", "roll-up3", "roll-up4"]),
        Prop("framerate", "30/1", type="str", doc="pair pacing for pts spacing"),
    ]

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (CEA608_CAPS if direction == PadDirection.SINK else TEXT_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def _frame_dur(self) -> int:
        f = Fraction(self.get_property("framerate"))
        return int(SECOND * f.denominator // f.numerator)

    def transform(self, inbuf: Buffer) -> Buffer:
        text = str(inbuf.data)
        mode = self.get_property("mode")
        if mode == "pop-on":
            pairs = cea608.encode_pop_on(text.split("\n"))
        elif mode == "paint-on":
            pairs = [cea608.control_pair(cea608.RCL)] + cea608.encode_pop_on(text.split("\n"))[1:]
        else:
            rows = int(mode[-1])
            pairs = []
            for line in text.split("\n"):
                pairs.extend(cea608.encode_roll_up(line, rows=rows))
        out = Buffer(pairs_to_array(pairs))
        out.pts = inbuf.pts
        out.duration = len(pairs) * self._frame_dur()
        return out


class _Cea608DecodeBase(BaseTransform):
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = CEA608_CAPS

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._dec = cea608.Cea608Decoder()
        self._out: deque = deque()

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (self.SRC_CAPS if direction == PadDirection.SINK else CEA608_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._dec = cea608.Cea608Decoder()
        self._out.clear()

    def caption_buffer(self, caption: cea608.Caption, pts) -> Optional[Buffer]:
        raise NotImplementedError

    def generate_output(self) -> Optional[Buffer]:
        if not self._out:
            inbuf = self.take_queued_buffer()
            if inbuf is None:
                return None
            for hi, lo in np.asarray(inbuf.data, np.uint8).reshape(-1, 2):
                self._dec.push_pair(int(hi), int(lo))
            for ev in self._dec.take_events():
                if ev is not None:
                    b = self.caption_buffer(ev, inbuf.pts)
                    if b is not None:
                        self._out.append(b)
        return self._out.popleft() if self._out else None

    def drain(self) -> Optional[Buffer]:
        self._dec.flush()
        for ev in self._dec.take_events():
            if ev is not None:
                b = self.caption_buffer(ev, None)
                if b is not None:
                    return b
        return None


@register
class Cea608ToTt(_Cea608DecodeBase):
    """CEA-608 -> timed text (reference cea608tott/imp.rs: pop-on captions
    emitted at EOC, roll-up rows at CR)."""

    ELEMENT_NAME = "cea608tott"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts CEA-608 closed captions to timed text"
    SRC_CAPS = TEXT_CAPS

    def caption_buffer(self, caption: cea608.Caption, pts) -> Buffer:
        return Buffer("\n".join(caption.lines), pts=pts)


@register
class Cea608ToJson(_Cea608DecodeBase):
    """CEA-608 -> JSON caption records (reference cea608tojson/imp.rs)."""

    ELEMENT_NAME = "cea608tojson"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts CEA-608 closed captions to JSON"
    SRC_CAPS = JSON_CAPS

    def caption_buffer(self, caption: cea608.Caption, pts) -> Buffer:
        rec = {"mode": caption.mode, "lines": [{"text": t} for t in caption.lines]}
        return Buffer(json.dumps(rec), pts=pts)


@register
class TtToJson(BaseTransform):
    """timed text -> JSON records (reference tttojson/)."""

    ELEMENT_NAME = "tttojson"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts timed text to JSON"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = JSON_CAPS

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (JSON_CAPS if direction == PadDirection.SINK else TEXT_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        rec = {"text": str(inbuf.data)}
        if inbuf.duration is not None:
            rec["duration"] = inbuf.duration
        out = Buffer(json.dumps(rec))
        out.copy_metadata_from(inbuf)
        return out


def _vtt_ts(ns: int) -> str:
    ms = ns // 1_000_000
    return f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:{ms // 1000 % 60:02d}.{ms % 1000:03d}"


@register
class JsonToVtt(BaseTransform):
    """JSON caption records -> WebVTT cues (reference jsontovtt/)."""

    ELEMENT_NAME = "jsontovtt"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts JSON captions to WebVTT"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = JSON_CAPS
    SRC_CAPS = Caps.builder("application/x-subtitle-vtt")
    PROPERTIES = [
        Prop("default-duration", 2 * SECOND, type="uint64",
             doc="cue duration when the record has none"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._sent_header = False

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._sent_header = False

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (self.SRC_CAPS if direction == PadDirection.SINK else JSON_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        rec = json.loads(str(inbuf.data))
        text = rec.get("text") or "\n".join(l["text"] for l in rec.get("lines", []))
        pts = inbuf.pts or 0
        dur = inbuf.duration or rec.get("duration") or self.get_property("default-duration")
        cue = f"{_vtt_ts(pts)} --> {_vtt_ts(pts + dur)}\n{text}\n\n"
        if not self._sent_header:
            cue = "WEBVTT\n\n" + cue
            self._sent_header = True
        out = Buffer(cue, pts=pts, duration=dur)
        return out


@register
class CCDetect(BaseTransform):
    """Detects presence of closed-caption data, posting a `cc-detect`
    element message on change (reference ccdetect/: window-based presence
    with cc608/cc708 notify properties)."""

    ELEMENT_NAME = "ccdetect"
    ELEMENT_CLASS = "Filter/Analysis"
    ELEMENT_DESCRIPTION = "Detects closed caption presence"
    MODE = TransformMode.ALWAYS_IN_PLACE
    SINK_CAPS = CEA608_CAPS
    SRC_CAPS = CEA608_CAPS
    PROPERTIES = [
        Prop("window", 10 * SECOND, type="uint64",
             doc="no-data interval after which presence flips off"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.cc608 = False
        self._last_data_pts: Optional[int] = None

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self.cc608 = False
        self._last_data_pts = None

    def _set_presence(self, present: bool) -> None:
        if present != self.cc608:
            self.cc608 = present
            self.post_message(
                Message(MessageType.ELEMENT,
                        structure=Structure("cc-detect", cc608=present, cc708=False))
            )

    def transform_ip(self, buf: Buffer) -> Buffer:
        pairs = np.asarray(buf.data, np.uint8).reshape(-1, 2)
        has_data = bool((pairs != 0x80).any())
        if has_data:
            self._last_data_pts = buf.pts
            self._set_presence(True)
        elif (
            self.cc608
            and buf.pts is not None
            and self._last_data_pts is not None
            and buf.pts - self._last_data_pts > self.get_property("window")
        ):
            self._set_presence(False)
        return buf


__all__ = [
    "TtToCea608", "Cea608ToTt", "Cea608ToJson", "TtToJson", "JsonToVtt",
    "CCDetect", "CEA608_CAPS",
]
