"""agingradio tests: deterministic via seed; effect-by-effect properties.

(The reference has no element tests for agingradio — its thread RNG makes it
nondeterministic, SURVEY.md §4; our seeded PRNG enables real assertions.)"""
import numpy as np

from gst_plugins_rs_tpu.core import Buffer, Caps, Harness, element_factory_make


def run(sig, rate=48000, ch=1, **props):
    elem = element_factory_make("agingradio")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("audio/x-raw", format="F32", rate=rate, channels=ch, layout="interleaved"))
    h.push(Buffer(sig.astype(np.float32), pts=0))
    return np.asarray(h.pull().data)


def test_quantization_only():
    # disable noise/clicks/lowpass/distortion: pure 4-bit quantizer
    sig = np.linspace(-0.9, 0.9, 1000)[:, None]
    out = run(sig, white_noise_ampl=0.0, clicks_prob=0.0, lowpass_freq=0,
              cubic_curve_distortion=0.0, bits_to_quantize=4.0)
    ref = np.round(sig * 16.0) / 16.0
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-7)


def test_cubic_distortion_only():
    sig = np.full((100, 1), 0.5)
    out = run(sig, white_noise_ampl=0.0, clicks_prob=0.0, lowpass_freq=0,
              bits_to_quantize=0.0, cubic_curve_distortion=1.0, cubic_curve_passes=1)
    np.testing.assert_allclose(out, 0.5 - 0.5**3, atol=1e-6)


def test_clicks_always():
    sig = np.zeros((64, 2))
    out = run(sig, clicks_prob=1.0)
    np.testing.assert_array_equal(out, np.ones_like(out))


def test_lowpass_smooths_step():
    # unit step through the single-pole filter converges toward ~the step
    sig = np.concatenate([np.zeros((10, 1)), np.full((2000, 1), 0.5)])
    out = run(sig, white_noise_ampl=0.0, clicks_prob=0.0, lowpass_freq=2000,
              bits_to_quantize=0.0, cubic_curve_distortion=0.0)
    assert out[11, 0] < 0.25  # smoothed rise
    assert abs(out[-1, 0] - 0.5) < 0.01  # converged


def test_deterministic_with_seed():
    sig = np.random.RandomState(0).uniform(-0.5, 0.5, (4800, 2))
    a = run(sig.copy(), seed=42)
    b = run(sig.copy(), seed=42)
    np.testing.assert_array_equal(a, b)
    c = run(sig.copy(), seed=43)
    assert not np.array_equal(a, c)


def test_noise_amplitude():
    sig = np.zeros((48000, 1))
    out = run(sig, white_noise_ampl=0.25, clicks_prob=0.0, lowpass_freq=0,
              bits_to_quantize=0.0, cubic_curve_distortion=0.0)
    assert 0.2 < np.abs(out).max() <= 0.25
    assert np.abs(out).mean() > 0.05
