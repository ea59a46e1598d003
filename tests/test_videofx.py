"""videocompare + colordetect tests (reference scenarios:
video/videofx/tests/videocompare.rs, tests/colordetect.rs)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import MessageType
from gst_plugins_rs_tpu.ops.palette import css_color_name


def test_css_color_names():
    assert css_color_name((255, 0, 0)) == "red"
    assert css_color_name((250, 5, 5)) == "red"
    assert css_color_name((0, 128, 0)) == "green"
    assert css_color_name((255, 255, 255)) == "white"


def test_videocompare_same_pattern_matches():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=3 ! video/x-raw,format=RGB,width=64,height=64 "
        "! videocompare name=compare ! fakesink name=sink "
        "videotestsrc pattern=red num-buffers=3 ! video/x-raw,format=RGB,width=64,height=64 ! compare."
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "videocompare"]
    assert len(msgs) == 3
    s = msgs[0].structure
    assert s["pad-distances"][0]["distance"] == 0.0
    assert p.by_name("sink").rendered == 3


def test_videocompare_different_pattern_no_match():
    # patterns must differ STRUCTURALLY: perceptual hashes of two solid
    # colors are identical (all-zero bits), same as the reference's
    # image_hasher behavior
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=2 ! video/x-raw,format=RGB,width=64,height=64 "
        "! videocompare name=compare ! fakesink "
        "videotestsrc pattern=checkers-8 num-buffers=2 ! video/x-raw,format=RGB,width=64,height=64 ! compare."
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "videocompare"]
    assert msgs == []


@pytest.mark.parametrize("algo", ["mean", "gradient", "vertgradient", "doublegradient", "blockhash"])
def test_videocompare_algorithms(algo):
    p = parse_launch(
        f"videotestsrc pattern=checkers-8 num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 "
        f"! videocompare name=compare hash-algo={algo} ! fakesink "
        f"videotestsrc pattern=checkers-8 num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 ! compare."
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "videocompare"]
    assert len(msgs) == 1  # identical frames -> distance 0 under every algo


def test_videocompare_threshold():
    # smpte vs gradient differ; with a huge threshold the message still posts
    p = parse_launch(
        "videotestsrc pattern=smpte num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 "
        "! videocompare name=compare max-dist-threshold=64 ! fakesink "
        "videotestsrc pattern=gradient num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 ! compare."
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "videocompare"]
    assert len(msgs) == 1
    assert msgs[0].structure["pad-distances"][0]["distance"] > 0


def test_colordetect_red():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=3 ! video/x-raw,format=RGB,width=64,height=64 "
        "! colordetect ! fakesink"
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "colordetect"]
    # color only CHANGES once (None -> red): exactly one message for 3 frames
    assert len(msgs) == 1
    assert msgs[0].structure["dominant-color"] == "red"
    assert (msgs[0].structure["palette"][0] >> 16) > 200


def test_colordetect_changes():
    from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make

    elem = element_factory_make("colordetect")
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=32, height=32, framerate=Fraction(30, 1)))
    red = np.zeros((32, 32, 3), np.uint8)
    red[..., 0] = 255
    blue = np.zeros((32, 32, 3), np.uint8)
    blue[..., 2] = 255
    h.push(Buffer(red, pts=0))
    h.push(Buffer(red, pts=1))
    h.push(Buffer(blue, pts=2))
    msgs = [m for m in h.bus.messages(MessageType.ELEMENT) if m.structure.name == "colordetect"]
    assert [m.structure["dominant-color"] for m in msgs] == ["red", "blue"]


def test_parse_multi_chain_by_name():
    p = parse_launch(
        "videotestsrc num-buffers=1 ! videocompare name=c ! fakesink "
        "videotestsrc num-buffers=1 ! c."
    )
    c = p.by_name("c")
    assert len(c.agg_pads()) == 2
