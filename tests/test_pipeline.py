"""End-to-end pipeline + negotiation tests (tier 3 of SURVEY.md §4)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import MessageType


def test_audiotestsrc_to_appsink():
    p = parse_launch(
        "audiotestsrc wave=sine freq=440 num-buffers=10 samplesperbuffer=1024 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 ! appsink name=sink"
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    assert sink.eos
    assert len(sink.samples) == 10
    data = sink.concat_audio()
    assert data.shape == (10240, 2)
    # deterministic sine: s[n] = 0.8*sin(2*pi*440*n/48000)
    n = np.arange(10240)
    ref = 0.8 * np.sin(2 * np.pi * 440.0 * n / 48000.0)
    np.testing.assert_allclose(data[:, 0], ref, atol=1e-5)
    np.testing.assert_array_equal(data[:, 0], data[:, 1])
    # PTS continuity
    pts = [s.buffer.pts for s in sink.samples]
    dur = [s.buffer.duration for s in sink.samples]
    for i in range(1, 10):
        assert pts[i] == pts[i - 1] + dur[i - 1]


def test_eos_message_on_bus():
    p = parse_launch("audiotestsrc num-buffers=2 ! fakesink name=sink")
    p.play_until_eos()
    msgs = p.bus.messages(MessageType.EOS)
    assert msgs


def test_caps_negotiation_fixates_defaults():
    p = parse_launch("audiotestsrc num-buffers=1 ! appsink name=sink")
    sink = p.by_name("sink")
    p.play_until_eos()
    s = sink.caps.structure(0)
    assert s["format"] == "F32"
    assert s["rate"] == 48000
    assert s["channels"] == 2


def test_capsfilter_forces_rate_and_format():
    p = parse_launch(
        "audiotestsrc num-buffers=1 ! audio/x-raw,format=F64,rate=192000,channels=1 ! appsink name=sink"
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    s = sink.caps.structure(0)
    assert s["format"] == "F64"
    assert s["rate"] == 192000
    assert s["channels"] == 1
    assert sink.samples[0].buffer.data.dtype == np.float64


def test_incompatible_caps_raises():
    p = parse_launch("audiotestsrc num-buffers=1 ! video/x-raw,format=RGB ! fakesink")
    with pytest.raises(Exception):
        p.play_until_eos()


def test_identity_passthrough():
    p = parse_launch("audiotestsrc num-buffers=3 samplesperbuffer=256 ! identity ! appsink name=sink")
    sink = p.by_name("sink")
    p.play_until_eos()
    assert len(sink.samples) == 3


def test_named_elements_and_by_name():
    p = parse_launch("audiotestsrc name=mysrc num-buffers=1 ! fakesink name=mysink")
    assert p.by_name("mysrc").ELEMENT_NAME == "audiotestsrc"
    assert p.by_name("mysink").ELEMENT_NAME == "fakesink"


def test_videotestsrc_smpte():
    p = parse_launch(
        "videotestsrc num-buffers=2 ! video/x-raw,format=RGB,width=128,height=64 ! appsink name=sink"
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    assert len(sink.samples) == 2
    frame = np.asarray(sink.samples[0].buffer.data)
    assert frame.shape == (64, 128, 3)
    # leftmost bar is 75% grey, rightmost is blue
    assert tuple(frame[0, 0]) == (191, 191, 191)
    assert tuple(frame[0, -1]) == (0, 0, 191)
