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


# ---------------------------------------------------------------------------
# BT.601 4:2:0 colorspace conversion (ops/yuv.py via videoconvert)
# ---------------------------------------------------------------------------
def _yuv_of(rgb_triplet):
    from gst_plugins_rs_tpu.ops.yuv import rgb_to_i420

    frame = np.tile(np.asarray(rgb_triplet, np.uint8), (8, 8, 1))
    y, u, v = (np.asarray(p) for p in rgb_to_i420(frame))
    return int(y[0, 0]), int(u[0, 0]), int(v[0, 0])


def test_rgb_to_i420_bt601_reference_colors():
    # ITU-R BT.601 studio-swing anchor points
    assert _yuv_of((255, 255, 255)) == (235, 128, 128)
    assert _yuv_of((0, 0, 0)) == (16, 128, 128)
    assert _yuv_of((255, 0, 0)) == (81, 90, 240)
    assert _yuv_of((0, 255, 0)) == (145, 54, 34)
    assert _yuv_of((0, 0, 255)) == (41, 240, 110)


def test_i420_roundtrip_close_on_block_constant_image():
    from gst_plugins_rs_tpu.ops.yuv import i420_to_rgb, rgb_to_i420

    rng = np.random.default_rng(5)
    # constant 2x2 blocks: chroma subsampling is lossless there, so the
    # round trip error is pure matrix+quantization (<= 2 LSB)
    small = rng.integers(0, 256, (16, 16, 3), np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    back = np.asarray(i420_to_rgb(*rgb_to_i420(img)))
    assert np.max(np.abs(back.astype(int) - img.astype(int))) <= 2


def test_nv12_repack_bit_exact():
    from gst_plugins_rs_tpu.ops.yuv import nv12_to_uv, uv_to_nv12

    rng = np.random.default_rng(6)
    u = rng.integers(0, 256, (8, 12), np.uint8)
    v = rng.integers(0, 256, (8, 12), np.uint8)
    u2, v2 = (np.asarray(p) for p in nv12_to_uv(uv_to_nv12(u, v)))
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


def test_videoconvert_rgb_to_i420_pipeline():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=1 ! video/x-raw,format=RGB,width=32,height=16 "
        "! videoconvert ! video/x-raw,format=I420 ! appsink name=sink"
    )
    p.play_until_eos()
    y, u, v = (np.asarray(pl) for pl in p.by_name("sink").samples[0].buffer.data)
    assert y.shape == (16, 32) and u.shape == (8, 16) and v.shape == (8, 16)
    assert int(y[0, 0]) == 81 and int(u[0, 0]) == 90 and int(v[0, 0]) == 240


def test_videoconvert_i420_to_bgrx_pipeline():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=1 ! video/x-raw,format=RGB,width=32,height=16 "
        "! videoconvert ! video/x-raw,format=NV12 "
        "! videoconvert ! video/x-raw,format=BGRx ! appsink name=sink"
    )
    p.play_until_eos()
    frame = np.asarray(p.by_name("sink").samples[0].buffer.data)
    assert frame.shape == (16, 32, 4)
    b, g, r = int(frame[0, 0, 0]), int(frame[0, 0, 1]), int(frame[0, 0, 2])
    assert r > 245 and g < 10 and b < 10  # red survives the 4:2:0 trip


def test_videoconvert_rgb_to_gray8_is_luma():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=1 "
        "! video/x-raw,format=RGB,width=8,height=8 "
        "! videoconvert ! video/x-raw,format=GRAY8 ! appsink name=sink")
    p.play_until_eos()
    g = np.asarray(p.by_name("sink").samples[0].buffer.data)
    # full-range BT.601 luma of pure red = 0.299*255 = 76, NOT the blue channel
    assert int(g[0, 0, 0]) == 76
