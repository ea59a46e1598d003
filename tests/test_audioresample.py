"""audioresample: polyphase rational resampling as one dilated XLA conv."""
import math

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.ops.resample import Resampler, design_filter


def _oracle(x, L, M, taps_per_phase=24):
    """Scalar reference: y[n] = sum_k h[k] x_up[n*M - D + k]."""
    h = design_filter(L, M, taps_per_phase).astype(np.float64)
    T = len(h)
    D = (T - 1) // 2
    n_total = (len(x) * L - T + D) // M + 1
    y = np.zeros((n_total, x.shape[1]))
    for n in range(n_total):
        s = n * M - D
        for k in range(T):
            j = s + k
            if j >= 0 and j % L == 0 and j // L < len(x):
                y[n] += h[k] * x[j // L]
    return y


@pytest.mark.parametrize("ri,ro", [(48000, 192000), (192000, 48000),
                                   (44100, 48000), (48000, 44100)])
def test_matches_scalar_oracle(ri, ro):
    g = math.gcd(ri, ro)
    L, M = ro // g, ri // g
    rng = np.random.default_rng(0)
    x = rng.standard_normal((700, 2)).astype(np.float32)
    want = _oracle(x.astype(np.float64), L, M)
    got = np.asarray(Resampler(ri, ro).process(x))
    n = min(len(got), len(want))
    assert n > 700 * L // M - 60  # all available outputs were emitted
    assert np.max(np.abs(got[:n] - want[:n])) < 1e-5


def test_chunked_equals_oneshot():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2000, 2)).astype(np.float32)
    for ri, ro in ((44100, 48000), (48000, 192000), (192000, 48000)):
        one = np.asarray(Resampler(ri, ro).process(x))
        rs = Resampler(ri, ro)
        parts = [np.asarray(rs.process(x[i:i + 233]))
                 for i in range(0, len(x), 233)]
        chunked = np.concatenate(parts, axis=0)
        assert len(chunked) == len(one)
        # identical up to f32 reassociation across block shapes
        np.testing.assert_allclose(chunked, one, atol=2e-6)


def test_dc_preserved():
    rs = Resampler(44100, 48000)
    y = np.asarray(rs.process(np.ones((3000, 1), np.float32)))
    assert np.max(np.abs(y[200:-10] - 1.0)) < 1e-5


def test_sine_snr_above_90db():
    for ri, ro in ((48000, 44100), (48000, 192000)):
        t = np.arange(48000) / 48000
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[:, None]
        y = np.asarray(Resampler(ri, ro).process(x))[:, 0]
        ref = np.sin(2 * np.pi * 1000 * np.arange(len(y)) / ro)
        core = slice(500, len(y) - 500)
        err = y[core] - ref[core]
        snr = 10 * np.log10(np.mean(ref[core] ** 2) / np.mean(err ** 2))
        assert snr > 90, (ri, ro, snr)


def test_identity_rate_is_passthrough():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    y = np.asarray(Resampler(48000, 48000).process(x))
    np.testing.assert_array_equal(y, x)


def test_pipeline_denoise_rate_to_loudnorm_rate():
    """The chain the reference needs GStreamer-core audioresample for:
    48 kHz elements feeding the 192 kHz-only audioloudnorm."""
    p = fx.parse_launch(
        "audiotestsrc wave=sine num-buffers=40 samplesperbuffer=4800 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 "
        "! audioresample ! audio/x-raw,rate=192000 "
        "! audioloudnorm ! appsink name=sink")
    p.play_until_eos()
    a = p.by_name("sink").concat_audio()
    n_expect = 40 * 4800 * 4
    assert a.shape[1] == 2
    assert abs(a.shape[0] - n_expect) < 1000  # + filter drain tail


def test_pipeline_timeline_is_gap_free():
    p = fx.parse_launch(
        "audiotestsrc num-buffers=5 samplesperbuffer=4410 "
        "! audio/x-raw,format=F32,rate=44100,channels=1 "
        "! audioresample ! audio/x-raw,rate=48000 ! appsink name=sink")
    p.play_until_eos()
    samples = p.by_name("sink").samples
    for prev, cur in zip(samples, samples[1:]):
        end = prev.buffer.pts + prev.buffer.duration
        assert abs(cur.buffer.pts - end) <= 1  # ns rounding only


def test_pipeline_full_production_audio_chain():
    """denoise (48 kHz-only) -> resample -> loudnorm (192 kHz-only) ->
    R-128 meter: the production chain that needs the rate bridge."""
    p = fx.parse_launch(
        "audiotestsrc wave=sine num-buffers=60 samplesperbuffer=4800 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audiornnoise "
        "! audioresample ! audio/x-raw,rate=192000 "
        "! audioloudnorm ! ebur128level interval=1000000000 "
        "! appsink name=sink")
    p.play_until_eos()
    a = p.by_name("sink").concat_audio()
    assert abs(a.shape[0] - 60 * 4800 * 4) < 2000
    levels = [m for m in p.bus.messages()
              if m.structure is not None
              and getattr(m.structure, "name", "") == "ebur128-level"]
    assert levels, "no loudness messages through the chain"
    final = levels[-1].structure
    # audioloudnorm targets -24 LUFS; the meter must re-measure it there
    assert abs(final["global-loudness"] + 24.0) < 1.5, dict(final.fields)


def test_short_first_buffer_pushes_no_empty_output():
    p = fx.parse_launch(
        "appsrc name=src caps=audio/x-raw,format=F32,rate=48000,channels=1 "
        "! audioresample ! audio/x-raw,rate=192000 ! appsink name=sink")
    src = p.by_name("src")
    src.push_buffer(fx.Buffer(np.zeros((4, 1), np.float32), pts=0))
    src.push_buffer(fx.Buffer(np.ones((480, 1), np.float32), pts=83_333))
    src.end_of_stream()
    p.play_until_eos()
    for s in p.by_name("sink").samples:
        assert np.asarray(s.buffer.data).shape[0] > 0
