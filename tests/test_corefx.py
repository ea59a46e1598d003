"""GStreamer-core support elements: volume/videoflip/videocrop/videorate/audiorate."""
import numpy as np

import gst_plugins_rs_tpu as fx


def _one_frame(desc):
    p = fx.parse_launch(desc)
    p.play_until_eos()
    return np.asarray(p.by_name("sink").samples[0].buffer.data)


def test_volume_scales_and_mutes():
    p = fx.parse_launch(
        "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=256 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 "
        "! volume volume=0.5 ! appsink name=sink")
    p.play_until_eos()
    half = p.by_name("sink").concat_audio()
    p = fx.parse_launch(
        "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=256 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 ! appsink name=sink")
    p.play_until_eos()
    full = p.by_name("sink").concat_audio()
    np.testing.assert_allclose(half, full * 0.5, atol=1e-7)
    p = fx.parse_launch(
        "audiotestsrc num-buffers=1 samplesperbuffer=64 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! volume mute=true ! appsink name=sink")
    p.play_until_eos()
    assert np.abs(p.by_name("sink").concat_audio()).max() == 0.0


def test_videoflip_orientations_match_numpy():
    base = _one_frame(
        "videotestsrc pattern=gradient num-buffers=1 "
        "! video/x-raw,format=RGB,width=32,height=16 ! appsink name=sink")
    cases = {
        "clockwise": np.rot90(base, k=-1, axes=(0, 1)),
        "counterclockwise": np.rot90(base, k=1, axes=(0, 1)),
        "rotate-180": base[::-1, ::-1],
        "horizontal-flip": base[:, ::-1],
        "vertical-flip": base[::-1, :],
        "upper-left-diagonal": np.swapaxes(base, 0, 1),
    }
    for method, want in cases.items():
        got = _one_frame(
            "videotestsrc pattern=gradient num-buffers=1 "
            "! video/x-raw,format=RGB,width=32,height=16 "
            f"! videoflip method={method} ! appsink name=sink")
        np.testing.assert_array_equal(got, want, err_msg=method)


def test_videocrop_region():
    base = _one_frame(
        "videotestsrc pattern=gradient num-buffers=1 "
        "! video/x-raw,format=RGB,width=32,height=16 ! appsink name=sink")
    got = _one_frame(
        "videotestsrc pattern=gradient num-buffers=1 "
        "! video/x-raw,format=RGB,width=32,height=16 "
        "! videocrop top=2 bottom=3 left=4 right=5 ! appsink name=sink")
    np.testing.assert_array_equal(got, base[2:-3, 4:-5])
    assert got.shape == (11, 23, 3)


def test_videorate_drop_and_duplicate():
    for tgt, nexp in (("10/1", 10), ("60/1", 60)):
        p = fx.parse_launch(
            "videotestsrc num-buffers=30 "
            "! video/x-raw,format=RGB,width=8,height=8,framerate=30/1 "
            f"! videorate ! video/x-raw,framerate={tgt} ! appsink name=sink")
        p.play_until_eos()
        samples = p.by_name("sink").samples
        assert len(samples) == nexp
        # output timeline is the exact target grid
        for i, s in enumerate(samples):
            den, num = {"10/1": (10, 1), "60/1": (60, 1)}[tgt]
            assert s.buffer.pts == i * 1_000_000_000 * num // den


def test_videorate_duplicates_most_recent_frame():
    p = fx.parse_launch(
        "videotestsrc pattern=gradient num-buffers=3 "
        "! video/x-raw,format=RGB,width=8,height=8,framerate=10/1 "
        "! videorate ! video/x-raw,framerate=30/1 ! appsink name=sink")
    p.play_until_eos()
    frames = [np.asarray(s.buffer.data) for s in p.by_name("sink").samples]
    assert len(frames) == 9
    for k in range(3):  # each input frame fills 3 slots
        np.testing.assert_array_equal(frames[3 * k], frames[3 * k + 1])
        np.testing.assert_array_equal(frames[3 * k], frames[3 * k + 2])


def test_audiorate_fills_gap_with_silence():
    p = fx.parse_launch(
        "appsrc name=src caps=audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audiorate ! appsink name=sink")
    src = p.by_name("src")
    src.push_buffer(fx.Buffer(np.ones((4800, 1), np.float32), pts=0,
                              duration=100_000_000))
    src.push_buffer(fx.Buffer(np.ones((4800, 1), np.float32),
                              pts=300_000_000, duration=100_000_000))
    src.end_of_stream()
    p.play_until_eos()
    a = p.by_name("sink").concat_audio()
    assert a.shape[0] == 4 * 4800  # gap became samples
    assert np.abs(a[4800:9600]).max() == 0.0  # ... of silence
    assert np.abs(a[:4800]).min() == 1.0 and np.abs(a[-4800:]).min() == 1.0


def test_audiorate_drops_overlap():
    p = fx.parse_launch(
        "appsrc name=src caps=audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audiorate ! appsink name=sink")
    src = p.by_name("src")
    src.push_buffer(fx.Buffer(np.full((4800, 1), 1.0, np.float32), pts=0,
                              duration=100_000_000))
    # overlaps the first buffer by 50 ms
    src.push_buffer(fx.Buffer(np.full((4800, 1), 2.0, np.float32),
                              pts=50_000_000, duration=100_000_000))
    src.end_of_stream()
    p.play_until_eos()
    a = p.by_name("sink").concat_audio()
    assert a.shape[0] == 4800 + 2400
    assert float(a[4800]) == 2.0  # overlap head was dropped, not doubled


# --- review-pass regressions (round-3 inline review) -----------------------
def test_videorate_preserves_input_rate_when_unconstrained():
    p = fx.parse_launch(
        "videotestsrc num-buffers=10 "
        "! video/x-raw,format=RGB,width=8,height=8,framerate=25/1 "
        "! videorate ! appsink name=sink")
    p.play_until_eos()
    samples = p.by_name("sink").samples
    assert len(samples) == 10  # no silent retime to a 30 fps default
    assert samples[1].buffer.pts - samples[0].buffer.pts == 40_000_000


def test_audiorate_untimestamped_buffers_are_contiguous():
    p = fx.parse_launch(
        "appsrc name=src caps=audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audiorate ! appsink name=sink")
    src = p.by_name("src")
    for _ in range(3):
        src.push_buffer(fx.Buffer(np.ones((4800, 1), np.float32)))
    src.end_of_stream()
    p.play_until_eos()
    assert p.by_name("sink").concat_audio().shape[0] == 3 * 4800


def test_videocrop_overcrop_fails_cleanly():
    p = fx.parse_launch(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGB,width=32,height=16 "
        "! videocrop left=20 right=20 ! appsink name=sink")
    try:
        p.play_until_eos()
        frames = p.by_name("sink").samples
        assert not frames or all(
            np.asarray(s.buffer.data).shape[1] > 0 for s in frames), \
            "zero-width frames must not reach downstream"
        raised = False
    except Exception:
        raised = True
    assert raised, "over-cropping must fail, not emit empty frames"


def test_volume_preserves_f64_dtype():
    p = fx.parse_launch(
        "appsrc name=src caps=audio/x-raw,format=F64,rate=48000,channels=1 "
        "! volume volume=0.5 ! appsink name=sink")
    src = p.by_name("src")
    src.push_buffer(fx.Buffer(np.ones((64, 1), np.float64)))
    src.end_of_stream()
    p.play_until_eos()
    out = p.by_name("sink").samples[0].buffer.data
    assert np.asarray(out).dtype == np.float64
    assert float(np.asarray(out)[0, 0]) == 0.5
