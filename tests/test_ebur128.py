"""EBU R-128 engine tests: BS.1770 spec constants, independent direct-math
oracle (no histogram), and known-value loudness/peak cases."""
import numpy as np
import pytest

from gst_plugins_rs_tpu.ops.ebur128 import (
    EbuR128,
    k_weighting_coeffs,
)

RATE = 48000


def test_k_weighting_matches_bs1770_at_48k():
    b, a = k_weighting_coeffs(48000)
    # ITU-R BS.1770 published coefficients at 48 kHz
    np.testing.assert_allclose(
        b[0], [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=1e-10
    )
    np.testing.assert_allclose(a[0], [1.0, -1.69065929318241, 0.73248077421585], atol=1e-10)
    np.testing.assert_allclose(a[1], [1.0, -1.99004745483398, 0.99007225036621], atol=1e-10)
    np.testing.assert_allclose(b[1], [1.0, -2.0, 1.0], atol=0)


def np_k_filter(x, rate):
    """Independent oracle IIR (scipy.signal.lfilter) per channel."""
    from scipy.signal import lfilter

    b, a = k_weighting_coeffs(rate)
    y = x.astype(np.float64)
    for stage in range(2):
        y = lfilter(b[stage], a[stage], y, axis=0)
    return y


def oracle_integrated(x, rate, weights=None):
    """Direct (no histogram) gated loudness per BS.1770."""
    y = np_k_filter(x, rate)
    ch = x.shape[1]
    w = np.ones(ch) if weights is None else weights
    n100 = rate // 10
    nblocks = x.shape[0] // n100
    sb = np.array([np.sum((y[i * n100 : (i + 1) * n100] ** 2) @ w) for i in range(nblocks)])
    # momentary blocks: 400 ms, every 100 ms, first at 400 ms
    if nblocks < 4:
        return -np.inf
    energies = np.array([(sb[i - 3 : i + 1].sum()) / (4 * n100) for i in range(3, nblocks)])
    abs_gate = 10 ** ((-70.0 + 0.691) / 10)
    g = energies[energies >= abs_gate]
    if len(g) == 0:
        return -np.inf
    rel = g.mean() * 0.1
    g2 = g[g >= rel]
    if len(g2) == 0:
        return -np.inf
    return -0.691 + 10 * np.log10(g2.mean())


def sine(freq, amp, secs, ch=1, rate=RATE):
    t = np.arange(int(secs * rate)) / rate
    return np.repeat((amp * np.sin(2 * np.pi * freq * t))[:, None], ch, axis=1)


def test_full_scale_997hz_mono_is_minus_3lufs():
    x = sine(997.0, 1.0, 2.0)
    r = EbuR128(1, RATE)
    r.add_frames(x)
    assert abs(r.loudness_global() - (-3.01)) < 0.1


def test_stereo_997hz_adds_3db():
    x = sine(997.0, 1.0, 2.0, ch=2)
    r = EbuR128(2, RATE)
    r.add_frames(x)
    assert abs(r.loudness_global() - (-0.0)) < 0.15


def test_quarter_amplitude_is_12db_down():
    x = sine(997.0, 0.25, 2.0)
    r = EbuR128(1, RATE)
    r.add_frames(x)
    assert abs(r.loudness_global() - (-3.01 - 12.04)) < 0.1


def test_matches_direct_oracle_on_noise():
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.5, 0.5, (RATE * 3, 2))
    # amplitude-modulate so gating matters
    env = np.where((np.arange(RATE * 3) // RATE) % 2 == 0, 1.0, 0.02)
    x *= env[:, None]
    r = EbuR128(2, RATE)
    # stream in odd-sized chunks to exercise the remainder path
    i = 0
    for n in (1234, 48000, 7000, 100000):
        r.add_frames(x[i : i + n])
        i += n
    r.add_frames(x[i:])
    ref = oracle_integrated(x, RATE)
    got = r.loudness_global()
    assert abs(got - ref) < 0.06  # histogram quantizes at 0.1 LU


def test_relative_gating_drops_silence():
    # loud 1 s + silent 10 s: gating must ignore the silence
    loud = sine(997.0, 0.5, 1.0)
    quiet = np.zeros((RATE * 10, 1))
    x = np.concatenate([loud, quiet])
    r = EbuR128(1, RATE)
    r.add_frames(x)
    got = r.loudness_global()
    # must match the direct-math oracle (transition blocks included like
    # libebur128), and stay near the loud level, not the ~-20 ungated mean
    assert abs(got - oracle_integrated(x, RATE)) < 0.06
    assert -10.5 < got < -9.0


def test_momentary_and_shortterm():
    x = sine(997.0, 1.0, 4.0)
    r = EbuR128(1, RATE)
    r.add_frames(x)
    assert abs(r.loudness_momentary() - (-3.01)) < 0.1
    assert abs(r.loudness_shortterm() - (-3.01)) < 0.1


def test_lra_two_level_signal():
    # EBU Tech 3342-style: 20 s at -20 LUFS then 20 s at -30 LUFS -> LRA ~10
    a1 = 10 ** ((-20.0 + 3.01) / 20.0)
    a2 = 10 ** ((-30.0 + 3.01) / 20.0)
    x = np.concatenate([sine(997.0, a1, 20.0), sine(997.0, a2, 20.0)])
    r = EbuR128(1, RATE)
    r.add_frames(x)
    assert abs(r.loudness_range() - 10.0) < 1.0


def test_sample_peak():
    x = sine(997.0, 0.6, 0.5, ch=2)
    x[1000, 0] = -0.95
    r = EbuR128(2, RATE)
    r.add_frames(x)
    assert abs(r.sample_peak(0) - 0.95) < 1e-9
    assert abs(r.sample_peak(1) - 0.6) < 1e-3


def test_true_peak_intersample():
    # a sine at rate/4 with phase offset has inter-sample peaks above samples
    t = np.arange(RATE // 2)
    x = (0.5 * np.sin(2 * np.pi * (RATE / 4.0) * t / RATE + np.pi / 4))[:, None]
    sp = np.abs(x).max()
    r = EbuR128(1, RATE)
    r.add_frames(x)
    assert r.sample_peak(0) == pytest.approx(sp, abs=1e-6)
    assert r.true_peak(0) > sp + 0.1  # ~0.5 true peak vs ~0.354 sample peak
    assert r.true_peak(0) == pytest.approx(0.5, abs=0.02)


def test_reset():
    r = EbuR128(1, RATE)
    r.add_frames(sine(997.0, 1.0, 1.0))
    r.reset()
    assert r.loudness_global() < -100
    assert r.sample_peak(0) == 0.0


def test_silence_is_minus_inf_ish():
    r = EbuR128(2, RATE)
    r.add_frames(np.zeros((RATE, 2)))
    assert r.loudness_global() < -100
    assert r.loudness_momentary() < -100
