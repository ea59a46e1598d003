"""Caps algebra and pipeline-language parser tests."""

from gst_plugins_rs_tpu.core import (
    Caps,
    IntRange,
    ValueList,
    parse_caps,
    parse_value,
)


def test_intersect_concrete():
    a = Caps.builder("audio/x-raw", format="F32", rate=48000)
    b = Caps.builder("audio/x-raw", format="F32", rate=48000, channels=2)
    i = a.intersect(b)
    assert not i.is_empty()
    assert i.structure(0)["channels"] == 2


def test_intersect_disjoint_format():
    a = Caps.builder("audio/x-raw", format="F32")
    b = Caps.builder("audio/x-raw", format="F64")
    assert a.intersect(b).is_empty()


def test_intersect_list_and_range():
    a = Caps.builder("audio/x-raw", format=ValueList(["F32", "F64"]), rate=IntRange(1, 192000))
    b = Caps.builder("audio/x-raw", format="F64", rate=48000)
    i = a.intersect(b)
    s = i.structure(0)
    assert s["format"] == "F64"
    assert s["rate"] == 48000


def test_intersect_range_range():
    a = Caps.builder("audio/x-raw", rate=IntRange(100, 200))
    b = Caps.builder("audio/x-raw", rate=IntRange(150, 300))
    assert a.intersect(b).structure(0)["rate"] == IntRange(150, 200)
    c = Caps.builder("audio/x-raw", rate=IntRange(201, 300))
    assert a.intersect(c).is_empty()


def test_fixate_with_hints():
    caps = Caps.builder("audio/x-raw", format=ValueList(["F32", "F64"]), rate=IntRange(1, 192000))
    fixed = caps.fixate({"rate": 48000})
    assert fixed.is_fixed()
    assert fixed.structure(0)["format"] == "F32"
    assert fixed.structure(0)["rate"] == 48000


def test_any_and_empty():
    any_ = Caps.new_any()
    conc = Caps.builder("video/x-raw", format="RGB")
    assert any_.intersect(conc) == conc
    assert conc.is_subset(any_)
    assert not any_.is_subset(conc)


def test_parse_caps():
    caps = parse_caps("audio/x-raw,format=F32,rate=48000,channels=2")
    s = caps.structure(0)
    assert s.name == "audio/x-raw"
    assert s["format"] == "F32"
    assert s["rate"] == 48000
    assert s["channels"] == 2


def test_parse_caps_list_and_range():
    caps = parse_caps("audio/x-raw,format={F32,F64},rate=[1,192000]")
    s = caps.structure(0)
    assert s["format"] == ValueList(["F32", "F64"])
    assert s["rate"] == IntRange(1, 192000)


def test_parse_value():
    assert parse_value("48000") == 48000
    assert parse_value("0.5") == 0.5
    assert parse_value("true") is True
    assert parse_value("sine") == "sine"
    from fractions import Fraction

    assert parse_value("30/1") == Fraction(30, 1)
