"""ebur128level element tests — port of the reference scenario
(audio/audiofx/tests/ebur128level.rs:96-153: 5 s of audiotestsrc at 48 kHz
stereo, interval=500 ms -> 10 messages with all typed fields) plus
value-accuracy checks against known loudness."""
import numpy as np
import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import MessageType


def run_pipeline(fmt):
    p = parse_launch(
        "audiotestsrc num-buffers=5 samplesperbuffer=48000 wave=sine freq=440 "
        f"! audio/x-raw,format={fmt},channels=2,rate=48000 "
        "! ebur128level interval=500000000 name=level ! appsink name=sink"
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    msgs = [
        m
        for m in p.bus.messages(MessageType.ELEMENT)
        if m.structure is not None and m.structure.name == "ebur128-level"
    ]
    return p, sink, msgs


@pytest.mark.parametrize("fmt", ["S16", "S32", "F32", "F64"])
def test_ebur128level_formats(fmt):
    p, sink, msgs = run_pipeline(fmt)
    assert len(sink.samples) == 5
    assert len(msgs) == 10
    for i, m in enumerate(msgs, start=1):
        s = m.structure
        assert s["timestamp"] == i * 500_000_000
        assert s["running-time"] == i * 500_000_000
        assert s["stream-time"] == i * 500_000_000
        assert isinstance(s["momentary-loudness"], float)
        assert isinstance(s["shortterm-loudness"], float)
        assert isinstance(s["global-loudness"], float)
        assert isinstance(s["relative-threshold"], float)
        assert isinstance(s["loudness-range"], float)
        assert len(s["sample-peak"]) == 2
        assert len(s["true-peak"]) == 2
        assert all(isinstance(v, float) for v in s["sample-peak"])
        assert all(isinstance(v, float) for v in s["true-peak"])


def test_loudness_values_stereo_sine():
    # 0.8 amplitude stereo 440 Hz sine: per-channel -1.94 dBFS;
    # stereo 997-ish region K-weight ~0 dB -> about -1.9 LUFS
    p, sink, msgs = run_pipeline("F64")
    final = msgs[-1].structure
    # 440 Hz K-weighting gain is slightly below unity; allow generous window
    assert -3.5 < final["global-loudness"] < -1.0
    assert final["sample-peak"][0] == pytest.approx(0.8, abs=1e-6)
    assert final["true-peak"][0] == pytest.approx(0.8, abs=0.01)
    # momentary ~ shortterm ~ global for a steady tone
    assert abs(final["momentary-loudness"] - final["global-loudness"]) < 0.3


def test_passthrough_data_unchanged():
    p, sink, msgs = run_pipeline("F32")
    data = sink.concat_audio()
    n = np.arange(data.shape[0])
    ref = (0.8 * np.sin(2 * np.pi * 440.0 * n / 48000.0)).astype(np.float32)
    # atol covers fp64 association differences in the reference expression
    np.testing.assert_allclose(data[:, 0], ref, atol=1e-9)


def test_mode_flags_restrict_fields():
    p = parse_launch(
        "audiotestsrc num-buffers=1 samplesperbuffer=48000 "
        "! audio/x-raw,format=F32,channels=2,rate=48000 "
        "! ebur128level interval=500000000 mode=1 ! fakesink"
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "ebur128-level"]
    assert len(msgs) == 2
    s = msgs[0].structure
    assert "momentary-loudness" in s
    assert "shortterm-loudness" not in s
    assert "global-loudness" not in s
    assert "sample-peak" not in s


def test_post_messages_false():
    p = parse_launch(
        "audiotestsrc num-buffers=1 samplesperbuffer=4800 "
        "! audio/x-raw,format=F32,channels=1,rate=48000 "
        "! ebur128level interval=100000000 post-messages=false ! fakesink"
    )
    p.play_until_eos()
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure and m.structure.name == "ebur128-level"]
    assert msgs == []


def test_reset_action():
    from gst_plugins_rs_tpu.core import State

    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=24000 wave=sine "
        "! audio/x-raw,format=F32,channels=1,rate=48000 "
        "! ebur128level interval=500000000 name=level ! fakesink"
    )
    level = p.by_name("level")
    p.set_state(State.PLAYING)
    srcs = p.sources()
    # push 2 buffers (1 s), reset, push rest
    srcs[0].iterate()
    srcs[0].iterate()
    level.reset()
    p.run()
    p.set_state(State.NULL)
    msgs = [m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "ebur128-level"]
    # reset restarts the interval countdown: 1 s before reset -> 2 msgs,
    # 1 s after -> 2 more
    assert len(msgs) == 4


def test_non_interleaved_layout_via_audioconvert():
    # mirror the reference's non-interleaved matrix entries
    # (tests/ebur128level.rs run_test with layout=non-interleaved)
    p = parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=48000 wave=sine freq=440 "
        "! audio/x-raw,format=F32,channels=2,rate=48000 "
        "! audioconvert "
        "! audio/x-raw,format=F32,channels=2,rate=48000,layout=non-interleaved "
        "! ebur128level interval=500000000 ! fakesink"
    )
    p.play_until_eos()
    msgs = [
        m for m in p.bus.messages(MessageType.ELEMENT) if m.structure.name == "ebur128-level"
    ]
    assert len(msgs) == 4
    # loudness must match the interleaved measurement of the same signal
    assert msgs[-1].structure["momentary-loudness"] == pytest.approx(-2.9, abs=0.5)
