"""Textual pipeline language parser (`gst::parse::launch` analog).

Same grammar subset the reference exercises in tests
(audio/audiofx/tests/audioloudnorm.rs:42-55):
``elem prop=v prop2=v ! elem2 ! caps,field=v ! elem3``.
A bare media-type token between links becomes a capsfilter.
"""
from __future__ import annotations

import re
import shlex
from fractions import Fraction
from typing import Any, List

from .caps import Caps, IntRange, Structure, ValueList
from .pipeline import Pipeline
from .registry import element_factory_make, factory_exists

_MEDIA_TYPE_RE = re.compile(r"^[a-zA-Z0-9]+/[a-zA-Z0-9][a-zA-Z0-9._+-]*([,(].*)?$")


def parse_value(text: str) -> Any:
    text = text.strip()
    if len(text) >= 2 and text[0] == text[-1] and text[0] in "\"'":
        return text[1:-1]
    low = text.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if re.fullmatch(r"[+-]?\d+", text):
        return int(text)
    if re.fullmatch(r"[+-]?\d+/\d+", text):
        n, d = text.split("/")
        return Fraction(int(n), int(d))
    try:
        return float(text)
    except ValueError:
        return text


def _parse_caps_value(text: str) -> Any:
    text = text.strip()
    if text.startswith("{") and text.endswith("}"):
        vals = [parse_value(v) for v in text[1:-1].split(",")]
        return vals[0] if len(vals) == 1 else ValueList(vals)
    if text.startswith("[") and text.endswith("]"):
        lo, hi = text[1:-1].split(",")
        return IntRange(int(lo), int(hi))
    # strip optional gst type annotations like (int)48000 / (string)F32
    m = re.fullmatch(r"\(([a-zA-Z]+)\)(.*)", text)
    if m:
        text = m.group(2)
    return parse_value(text)


def parse_caps(text: str) -> Caps:
    """Parse 'audio/x-raw,format=F32,rate=48000' into Caps."""
    if text.strip().upper() == "ANY":
        return Caps.new_any()
    # split on ';' for multiple structures
    structures = []
    for chunk in text.split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        # split top-level commas (respect {...} and [...])
        parts: List[str] = []
        depth = 0
        cur = ""
        for ch in chunk:
            if ch in "{[":
                depth += 1
            elif ch in "}]":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        if cur:
            parts.append(cur)
        name = parts[0].strip()
        fields = {}
        for p in parts[1:]:
            k, v = p.split("=", 1)
            fields[k.strip()] = _parse_caps_value(v)
        structures.append(Structure(name, **fields))
    return Caps(structures)


def _make_element(head: str, prop_tokens) -> "object":
    if _MEDIA_TYPE_RE.match(head) and not factory_exists(head):
        # caps filter shorthand: media-type optionally followed by
        # comma-joined fields already merged into `head`
        elem = element_factory_make("capsfilter")
        elem.set_property("caps", parse_caps(head))
        if prop_tokens:
            raise ValueError(f"caps filter cannot take properties: {prop_tokens}")
        return elem
    instance_name = None
    props = []
    for tok in prop_tokens:
        if "=" not in tok:
            raise ValueError(f"bad property token {tok!r}")
        k, v = tok.split("=", 1)
        if k == "name":
            instance_name = v
        else:
            props.append((k, v))
    elem = element_factory_make(head, instance_name)
    for k, v in props:
        spec = elem._prop_specs.get(k)
        if spec is not None and spec.type == "object" and k == "caps":
            elem.set_property(k, parse_caps(v.strip('"')))
        else:
            elem.set_property(k, parse_value(v))
    return elem


def parse_launch(description: str) -> Pipeline:
    """gst-launch grammar subset: chains of `elem prop=v ! elem ! ...`;
    several chains in one description; a trailing `name.` (or `name.pad`)
    token links the chain into the named element's (request) sink pad."""
    tokens = shlex.split(description)
    if not tokens:
        raise ValueError("empty pipeline description")

    pipeline = Pipeline()
    prev = None  # last element of the current chain
    expect_element = True  # True right after "!" or at a chain start
    deferred = []  # (src_element, target_name) forward references

    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok == "!":
            if prev is None or expect_element:
                raise ValueError(f"empty element in pipeline: {description!r}")
            expect_element = True
            i += 1
            continue

        if not expect_element:
            # a bare element token right after a finished element: new chain
            prev = None
            expect_element = True
            continue

        # reference to a named element: "name." or "name.padname"
        m = re.fullmatch(r"([A-Za-z_][\w-]*)\.([\w%]+)?", tok)
        if m and not _MEDIA_TYPE_RE.match(tok):
            try:
                target = pipeline.by_name(m.group(1))
            except KeyError:
                # forward reference to a name defined later in the
                # description (gst-launch allows this); only a chain END
                # ("... ! mux.") can be deferred
                if prev is None:
                    raise
                deferred.append((prev, m.group(1)))
                prev = None
                expect_element = False
                i += 1
                continue
            if prev is None:
                # chain STARTS at the named element ("t. ! sink")
                prev = target
            else:
                prev.link(target)
                prev = target
            expect_element = False
            i += 1
            continue

        head = tok
        props = []
        j = i + 1
        while j < len(tokens) and tokens[j] not in ("!",) and "=" in tokens[j] and not tokens[j].endswith("."):
            props.append(tokens[j])
            j += 1
        elem = _make_element(head, props)
        pipeline.add(elem)
        if prev is not None:
            prev.link(elem)
        prev = elem
        expect_element = False
        i = j
    if expect_element:
        raise ValueError(f"empty element in pipeline: {description!r}")
    for src, name in deferred:
        src.link(pipeline.by_name(name))
    return pipeline


__all__ = ["parse_launch", "parse_caps", "parse_value"]
