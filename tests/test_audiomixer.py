"""audiomixer tests incl. the reference-style loudnorm limiter pipeline
(audio/audiofx/tests/audioloudnorm.rs:40-49 mixes tick trains into a sine
via audiomixer)."""
import numpy as np

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import SECOND


def test_mixes_two_sines():
    p = parse_launch(
        "audiotestsrc wave=sine freq=440 volume=0.25 num-buffers=10 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audiomixer name=mix output-buffer-duration=10000000 ! appsink name=sink "
        "audiotestsrc wave=sine freq=440 volume=0.25 num-buffers=10 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! mix."
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    data = sink.concat_audio()
    assert data.shape[0] == 4800
    ref = 0.5 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000)
    np.testing.assert_allclose(data[:, 0], ref, atol=1e-5)
    pts = [s.buffer.pts for s in sink.samples]
    assert pts[0] == 0 and pts[1] == 10 * SECOND // 1000


def test_loudnorm_limiter_pipeline_with_mixer():
    # the reference limiter scenario wired exactly like upstream, at 192 kHz
    p = parse_launch(
        "audiotestsrc wave=sine volume=0.05 num-buffers=400 samplesperbuffer=1920 "
        "! audio/x-raw,format=F64,rate=192000,channels=1 "
        "! audiomixer name=mixer output-buffer-duration=10000000 "
        "! audio/x-raw,format=F64,rate=192000,channels=1 "
        "! audioloudnorm ! appsink name=sink "
        "audiotestsrc wave=ticks sine-periods-per-tick=1 tick-interval=4000000000 "
        "num-buffers=400 samplesperbuffer=1920 "
        "! audio/x-raw,format=F64,rate=192000,channels=1 ! mixer."
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    data = sink.concat_audio()
    assert data.shape[0] == 400 * 1920
    from gst_plugins_rs_tpu.ops.ebur128 import EbuR128

    r = EbuR128(1, 192000)
    r.add_frames(data)
    assert abs(r.loudness_global() + 24.0) < 1.0
    assert 20 * np.log10(r.sample_peak(0)) <= -2.0 + 1e-6
