"""Text elements: regex replace, wrap, accumulate, JSON encode/parse.

Parity targets: text/regex (455 LoC regex transform), text/wrap (984,
textwrap), text/accumulate (2063, textaccumulate rolling captions),
text/json (1767, jsongstenc/jsongstparse).  Text buffers carry Python str
payloads in `Buffer.data` (host control plane — no device work here).
"""
from __future__ import annotations

import json
import re
import textwrap
from typing import List, Optional

from ...core import (
    BaseTransform,
    Buffer,
    Caps,
    Prop,
    TransformMode,
    register,
)

TEXT_CAPS = Caps.builder("text/x-raw", format="utf8")
JSON_CAPS = Caps.builder("application/x-json")


class _TextTransform(BaseTransform):
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE


@register
class TextRegex(_TextTransform):
    ELEMENT_NAME = "regex"
    ELEMENT_CLASS = "Text/Filter"
    ELEMENT_DESCRIPTION = "Applies regex replacement operations on text buffers"
    PROPERTIES = [
        Prop("pattern", "", type="str", mutable="playing"),
        Prop("replacement", "", type="str", mutable="playing"),
    ]

    def transform(self, inbuf: Buffer) -> Buffer:
        pattern = self.get_property("pattern")
        text = str(inbuf.data)
        if pattern:
            text = re.sub(pattern, self.get_property("replacement"), text)
        out = Buffer(text)
        out.copy_metadata_from(inbuf)
        return out


@register
class TextWrap(_TextTransform):
    ELEMENT_NAME = "textwrap"
    ELEMENT_CLASS = "Text/Filter"
    ELEMENT_DESCRIPTION = "Wraps text buffers to a column limit"
    PROPERTIES = [
        Prop("columns", 32, type="uint", minimum=1, mutable="playing"),
        Prop("lines", 0, type="uint", mutable="playing",
             doc="Split output into buffers of this many lines (0 = one buffer)"),
    ]

    def transform(self, inbuf: Buffer) -> Buffer:
        wrapped = textwrap.fill(str(inbuf.data), width=self.get_property("columns"))
        out = Buffer(wrapped)
        out.copy_metadata_from(inbuf)
        return out


@register
class TextAccumulate(_TextTransform):
    ELEMENT_NAME = "textaccumulate"
    ELEMENT_CLASS = "Text/Filter"
    ELEMENT_DESCRIPTION = "Accumulates text across buffers (rolling captions)"
    PROPERTIES = [
        Prop("drain-on-final", True, type="bool", mutable="playing"),
        Prop("separator", " ", type="str", mutable="ready"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._acc: List[str] = []
        self._first_pts: Optional[int] = None

    def start(self) -> None:
        self._acc = []
        self._first_pts = None

    def transform(self, inbuf: Buffer) -> Buffer:
        if self._first_pts is None:
            self._first_pts = inbuf.pts
        self._acc.append(str(inbuf.data))
        out = Buffer(self.get_property("separator").join(self._acc), pts=self._first_pts)
        out.duration = inbuf.duration
        return out

    def drain(self) -> Optional[Buffer]:
        if not self._acc or not self.get_property("drain-on-final"):
            return None
        text = self.get_property("separator").join(self._acc)
        self._acc = []
        return Buffer(text, pts=self._first_pts)


class _ConvertCaps(BaseTransform):
    """Transform with different sink/src media types: propose the opposite
    template wholesale."""

    def transform_caps(self, direction, caps, filter_):
        from ...core import PadDirection

        out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out


@register
class JsonGstEnc(_ConvertCaps):
    ELEMENT_NAME = "jsongstenc"
    ELEMENT_CLASS = "Text/Encoder"
    ELEMENT_DESCRIPTION = "Wraps buffers into newline-delimited JSON"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = JSON_CAPS

    def transform(self, inbuf: Buffer) -> Buffer:
        record = {"text": str(inbuf.data)}
        if inbuf.pts is not None:
            record["pts"] = inbuf.pts
        if inbuf.duration is not None:
            record["duration"] = inbuf.duration
        out = Buffer(json.dumps(record) + "\n")
        out.copy_metadata_from(inbuf)
        return out


@register
class JsonGstParse(_ConvertCaps):
    ELEMENT_NAME = "jsongstparse"
    ELEMENT_CLASS = "Text/Parser"
    ELEMENT_DESCRIPTION = "Parses newline-delimited JSON back into text buffers"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = JSON_CAPS
    SRC_CAPS = TEXT_CAPS

    def transform(self, inbuf: Buffer) -> Buffer:
        record = json.loads(str(inbuf.data))
        out = Buffer(
            record.get("text", ""),
            pts=record.get("pts"),
            duration=record.get("duration"),
        )
        return out


__all__ = ["TextRegex", "TextWrap", "TextAccumulate", "JsonGstEnc", "JsonGstParse"]
