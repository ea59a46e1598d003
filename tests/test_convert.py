"""tee / audioconvert / videoconvert tests."""
import numpy as np

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import Caps, Harness, element_factory_make


def test_tee_duplicates():
    p = parse_launch(
        "audiotestsrc num-buffers=3 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! tee name=t "
        "t. ! appsink name=a  t. ! appsink name=b"
    )
    p.play_until_eos()
    a, b = p.by_name("a"), p.by_name("b")
    assert len(a.samples) == 3 and len(b.samples) == 3
    np.testing.assert_array_equal(a.concat_audio(), b.concat_audio())


def test_audioconvert_s16_to_f32():
    p = parse_launch(
        "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=480 "
        "! audio/x-raw,format=S16,rate=48000,channels=1 "
        "! audioconvert ! audio/x-raw,format=F32,rate=48000,channels=1 ! appsink name=sink"
    )
    p.play_until_eos()
    sink = p.by_name("sink")
    data = sink.concat_audio()
    assert data.dtype == np.float32
    assert 0.7 < np.abs(data).max() <= 0.8  # 0.8 sine quantized via S16


def test_audioconvert_f32_to_s16_clips():
    elem = element_factory_make("audioconvert")
    h = Harness(elem)

    # negotiate F32 -> S16 by constraining downstream
    h.sinkpad.chain_function = h._chain
    caps_in = Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1, layout="interleaved")
    # use a pipeline for negotiation instead
    p = parse_launch(
        "audiotestsrc wave=sine volume=1.0 num-buffers=1 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audioconvert ! audio/x-raw,format=S16,rate=48000,channels=1 ! appsink name=sink"
    )
    p.play_until_eos()
    data = p.by_name("sink").concat_audio()
    assert data.dtype == np.int16
    assert data.max() <= 32767 and data.min() >= -32768
    assert data.max() > 30000


def test_videoconvert_rgb_to_bgra():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=1 ! video/x-raw,format=RGB,width=8,height=8 "
        "! videoconvert ! video/x-raw,format=BGRA,width=8,height=8 ! appsink name=sink"
    )
    p.play_until_eos()
    frame = np.asarray(p.by_name("sink").samples[0].buffer.data)
    assert frame.shape == (8, 8, 4)
    assert tuple(frame[0, 0]) == (0, 0, 255, 255)  # BGRA red, opaque alpha


def test_videoconvert_same_format_passthrough():
    p = parse_launch(
        "videotestsrc pattern=checkers-8 num-buffers=1 ! video/x-raw,format=RGB,width=16,height=16 "
        "! videoconvert ! video/x-raw,format=RGB,width=16,height=16 ! appsink name=sink"
    )
    p.play_until_eos()
    assert np.asarray(p.by_name("sink").samples[0].buffer.data).shape == (16, 16, 3)
