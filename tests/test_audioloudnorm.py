"""audioloudnorm integration tests — port of the reference's 12 scenarios
(audio/audiofx/tests/audioloudnorm.rs): push deterministic signals through
the element, re-measure with an independent EbuR128 instance, assert
integrated loudness within +-1 LU of -24, per-channel peak <= -2 dB, exact
sample-count conservation and <=1 ns PTS continuity."""
import numpy as np
import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import Buffer, Caps, SECOND, element_factory_make
from gst_plugins_rs_tpu.ops.ebur128 import EbuR128

RATE = 192_000


def run_pipeline_signal(signal, channels, spb):
    """Push `signal` [N, ch] through audioloudnorm via appsrc in spb chunks."""
    p = parse_launch("appsrc name=src ! audioloudnorm ! appsink name=sink")
    src = p.by_name("src")
    caps = Caps.builder(
        "audio/x-raw", format="F64", rate=RATE, channels=channels, layout="interleaved"
    )
    src.set_property("caps", caps)
    n = signal.shape[0]
    for i in range(0, n, spb):
        chunk = signal[i : i + spb]
        src.push_buffer(
            Buffer(chunk, pts=i * SECOND // RATE, offset=i, duration=chunk.shape[0] * SECOND // RATE)
        )
    src.end_of_stream()
    p.play_until_eos()
    return p.by_name("sink")


def check_output(sink, channels, expected_samples, expected_loudness, peak_limit_db=-2.0):
    r128 = EbuR128(channels, RATE)
    num_samples = 0
    expected_ts = 0
    for s in sink.samples:
        buf = s.buffer
        assert buf.pts is not None
        assert abs(buf.pts - expected_ts) <= 1, f"TS {buf.pts} != {expected_ts}"
        data = np.asarray(buf.data)
        num_samples += data.shape[0]
        r128.add_frames(data)
        expected_ts += data.shape[0] * SECOND // RATE
    assert num_samples == expected_samples
    loudness = r128.loudness_global()
    if expected_loudness == -np.inf:
        assert loudness < -100, f"loudness {loudness} not -inf"
    else:
        assert abs(loudness - expected_loudness) < 1.0, f"loudness {loudness} != {expected_loudness}"
    for c in range(channels):
        sp = r128.sample_peak(c)
        peak = 20 * np.log10(sp) if sp > 0 else -np.inf
        assert peak <= peak_limit_db + 1e-6, f"peak ch{c} {peak} > {peak_limit_db}"


def sine(amp, n, ch, freq=440.0):
    t = np.arange(n) / RATE
    return np.repeat((amp * np.sin(2 * np.pi * freq * t))[:, None], ch, axis=1)


def white(amp, n, ch, seed=0):
    rng = np.random.RandomState(seed)
    return np.repeat(rng.uniform(-amp, amp, n)[:, None], ch, axis=1)


def ticks(amp, n, ch, periods_per_tick=1, tick_interval_s=4.0, freq=440.0):
    t = np.arange(n) / RATE
    pos = np.mod(np.arange(n), tick_interval_s * RATE)
    tick_len = periods_per_tick * RATE / freq
    sig = np.where(pos < tick_len, amp * np.sin(2 * np.pi * freq * t), 0.0)
    return np.repeat(sig[:, None], ch, axis=1)


N_LONG = 500 * 1920  # 5 s (reference uses 10 s; 5 s keeps CPU runtime sane)


def test_basic():
    sig = sine(0.8, 1000 * 1920, 1)
    sink = run_pipeline_signal(sig, 1, 1920)
    check_output(sink, 1, sig.shape[0], -24.0)


def test_basic_white_noise():
    sig = white(0.8, N_LONG, 1)
    sink = run_pipeline_signal(sig, 1, 1920)
    check_output(sink, 1, sig.shape[0], -24.0)


def test_remaining_at_eos():
    # 1024 spb -> stream length not a multiple of 100 ms frames
    sig = sine(0.8, 500 * 1024, 1)
    sink = run_pipeline_signal(sig, 1, 1024)
    check_output(sink, 1, sig.shape[0], -24.0)


def test_short_input():
    # 100 * 1024 samples ~ 0.53 s < 3 s -> linear processing
    sig = sine(0.8, 100 * 1024, 1)
    sink = run_pipeline_signal(sig, 1, 1024)
    check_output(sink, 1, sig.shape[0], -24.0)


def test_basic_two_channels():
    sig = sine(0.8, N_LONG, 2)
    sink = run_pipeline_signal(sig, 2, 1920)
    check_output(sink, 2, sig.shape[0], -24.0)


def test_silence():
    sig = np.zeros((500 * 1024, 1))
    sink = run_pipeline_signal(sig, 1, 1024)
    check_output(sink, 1, sig.shape[0], -np.inf)


@pytest.mark.parametrize("volume,label", [(0.5, "quiet"), (0.1, "very_quiet"), (0.01, "very_very_quiet")])
def test_quiet_levels(volume, label):
    sig = sine(volume, N_LONG, 1)
    sink = run_pipeline_signal(sig, 1, 1920)
    check_output(sink, 1, sig.shape[0], -24.0)


def test_below_threshold():
    sig = sine(0.00045, N_LONG, 1)
    sink = run_pipeline_signal(sig, 1, 1920)
    check_output(sink, 1, sig.shape[0], -np.inf)


def test_limiter():
    # quiet sine + loud short ticks every 4 s: limiter must clamp the peaks
    n = N_LONG
    sig = sine(0.05, n, 1) + ticks(0.8, n, 1, periods_per_tick=1)
    sink = run_pipeline_signal(sig, 1, 1024)
    check_output(sink, 1, n, -24.0)


def test_limiter_on_first_frame():
    n = N_LONG
    sig = sine(0.05, n, 1) + ticks(0.8, n, 1, periods_per_tick=10)
    sink = run_pipeline_signal(sig, 1, 1024)
    check_output(sink, 1, n, -24.0)


def test_latency_query():
    from gst_plugins_rs_tpu.core import Harness

    elem = element_factory_make("audioloudnorm")
    h = Harness(elem)
    q = h.query_latency()
    assert q.result["min_latency"] == 3 * SECOND
