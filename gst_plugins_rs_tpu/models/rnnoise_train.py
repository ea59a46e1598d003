"""In-repo RNNoise trainer — makes audiornnoise actually denoise.

The reference element wraps nnnoiseless's pretrained DenoiseState
(audio/audiofx/src/audiornnoise/imp.rs:20,182-252); those weights are
embedded in a binary crate and this environment has no egress, so the
GRU stack (ops/rnnoise.py) is trained here from scratch on synthetic
noisy-speech mixtures, with the published RNNoise losses (band-gain MSE
on gains**0.5 + VAD BCE — J.-M. Valin, "A Hybrid DSP/Deep Learning
Approach to Real-Time Full-Band Speech Enhancement", 2018).

Everything the deployed element sees is reproduced exactly at training
time: features come from the same `analysis_frames_scan` front end, and
the scan freezes RNN state on silent frames just like `denoise_frame`.

Speech is synthesized (no datasets in-repo either): glottal pulse trains
swept over f0 with 3 drifting formant resonators, unvoiced fricative
bursts, syllable-rate amplitude envelopes and inter-word pauses.  Noise
mixes white/pink/hum/banded processes at SNRs from -5 to 15 dB.

Run:  python -m gst_plugins_rs_tpu.models.rnnoise_train [out.npz]
(about 10-20 min on CPU; forces the CPU backend so the axon TPU relay is
left free — the model is 87k params, far below MXU scale).
"""
from __future__ import annotations

import sys

import numpy as np

from ..ops.rnnoise import (
    FRAME_SIZE,
    NB_BANDS,
    WEIGHT_KEYS,
    analysis_frames_scan,
    denoise_init,
    random_weights,
    rnn_frame,
)

SR = 48000


# ---------------------------------------------------------------------------
# synthetic speech / noise
# ---------------------------------------------------------------------------


def _resonator(x: np.ndarray, freq: float, bw: float) -> np.ndarray:
    """Two-pole formant resonator (classic Klatt synthesizer section)."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [1 - r]  # unity-ish gain at resonance
    return lfilter(b, a, x)


def synth_speech(rng: np.random.RandomState, n: int):
    """Speech-like signal + per-sample voice-activity mask.

    Alternating voiced (glottal pulses through drifting formants) and
    unvoiced (shaped noise bursts) syllables with pauses.
    """
    out = np.zeros(n, np.float32)
    active = np.zeros(n, bool)
    t = 0
    # canonical vowel formant targets (F1, F2, F3) in Hz
    vowels = [(730, 1090, 2440), (270, 2290, 3010), (300, 870, 2240),
              (660, 1720, 2410), (520, 1190, 2390)]
    while t < n:
        if rng.rand() < 0.25:  # pause
            t += rng.randint(int(0.06 * SR), int(0.3 * SR))
            continue
        dur = rng.randint(int(0.08 * SR), int(0.35 * SR))
        dur = min(dur, n - t)
        if dur <= 0:
            break
        seg = np.zeros(dur, np.float32)
        if rng.rand() < 0.75:  # voiced
            f0 = rng.uniform(80, 260)
            f0_end = f0 * rng.uniform(0.8, 1.25)
            inst_f0 = np.linspace(f0, f0_end, dur)
            phase = np.cumsum(inst_f0) / SR
            # glottal pulse train: impulses at phase wraps, slight shimmer
            pulses = np.zeros(dur, np.float32)
            wraps = np.where(np.diff(np.floor(phase)) > 0)[0]
            pulses[wraps] = 1.0 + 0.2 * rng.randn(len(wraps)).astype(np.float32)
            f1, f2, f3 = vowels[rng.randint(len(vowels))]
            drift = rng.uniform(0.9, 1.1)
            seg = (_resonator(pulses, f1 * drift, 90)
                   + 0.6 * _resonator(pulses, f2 * drift, 110)
                   + 0.25 * _resonator(pulses, f3 * drift, 170)).astype(np.float32)
        else:  # unvoiced fricative: band-passed noise burst (3-9 kHz-ish)
            noise = rng.randn(dur).astype(np.float32)
            fc = rng.uniform(3000, 9000)
            seg = 0.5 * _resonator(noise, fc, 2500).astype(np.float32)
        # syllable envelope: attack/decay
        env = np.minimum(np.linspace(0, 4, dur), np.linspace(4, 0, dur))
        env = np.clip(env, 0, 1).astype(np.float32)
        seg *= env
        m = np.max(np.abs(seg)) + 1e-9
        seg *= rng.uniform(0.3, 0.9) / m
        out[t:t + dur] = seg
        active[t:t + dur] = env > 0.1
        t += dur + rng.randint(0, int(0.1 * SR))
    # Band-limit to the masked range: the eband5ms structure covers bins
    # 0..400 = 0..20 kHz; frequencies above are always zeroed by the gain
    # interpolation (as in RNNoise), so speech content there would be
    # unrecoverable and real speech has none anyway.
    from scipy.signal import butter, lfilter as _lf

    b, a = butter(6, 16000 / (SR / 2))
    out = _lf(b, a, out).astype(np.float32)
    return out, active


def synth_noise(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Stationary-ish noise: white / pink / hum / band-passed, slow drift."""
    from scipy.signal import lfilter

    kind = rng.randint(4)
    x = rng.randn(n).astype(np.float32)
    if kind == 0:  # white
        y = x
    elif kind == 1:  # pink (-3 dB/oct approximation, Voss filter)
        b = [0.049922035, -0.095993537, 0.050612699, -0.004408786]
        a = [1, -2.494956002, 2.017265875, -0.522189400]
        y = lfilter(b, a, x).astype(np.float32)
    elif kind == 2:  # mains hum + its harmonics over a white floor
        tt = np.arange(n) / SR
        y = 0.2 * x
        for h, amp in ((50, 1.0), (100, 0.5), (150, 0.3), (200, 0.2)):
            y = y + amp * np.sin(2 * np.pi * h * tt + rng.uniform(0, 6.28))
        y = y.astype(np.float32)
    else:  # band-limited roar (fan/wind-ish)
        fc = rng.uniform(300, 3000)
        r = 0.98
        theta = 2 * np.pi * fc / SR
        y = lfilter([1 - r], [1, -2 * r * np.cos(theta), r * r], x).astype(np.float32)
    # slow amplitude drift
    drift = 1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.1, 0.5) * np.arange(n) / SR
                               + rng.uniform(0, 6.28))
    y = (y * drift).astype(np.float32)
    return y / (np.std(y) + 1e-9)


def make_mixture(rng: np.random.RandomState, n_frames: int):
    """One training sequence: (noisy [n], clean [n], vad mask per sample)."""
    n = n_frames * FRAME_SIZE
    kind = rng.rand()
    if kind < 0.1:  # noise only
        clean = np.zeros(n, np.float32)
        active = np.zeros(n, bool)
    else:
        clean, active = synth_speech(rng, n)
    if kind > 0.85:  # clean/near-clean speech (teach gains ~ 1)
        if kind > 0.93:
            return clean.copy(), clean, active
        noise = synth_noise(rng, n)
        sp = np.mean(clean[active] ** 2) if active.any() else 1e-4
        noise *= np.sqrt(sp / (10.0 ** (rng.uniform(20.0, 35.0) / 10.0)))
        noisy = np.clip(clean + noise, -1.0, 1.0)
        return noisy.astype(np.float32), clean, active
    noise = synth_noise(rng, n)
    sp = np.mean(clean[active] ** 2) if active.any() else 0.0
    snr_db = rng.uniform(-5.0, 20.0)
    if sp > 0:
        target_np = sp / (10.0 ** (snr_db / 10.0))
        noise *= np.sqrt(target_np)
    else:
        noise *= rng.uniform(0.02, 0.3)
    noisy = np.clip(clean + noise, -1.0, 1.0)
    return noisy.astype(np.float32), clean, active


# ---------------------------------------------------------------------------
# dataset -> features/targets (front end identical to inference)
# ---------------------------------------------------------------------------


def build_dataset(n_seq: int, n_frames: int, seed: int = 0, progress=None):
    """Returns features [N,T,42], gain targets [N,T,22], vad [N,T],
    loss mask [N,T], silence flags [N,T] (all np.float32/bool)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)

    @jax.jit
    def analyze(frames):  # frames [T, 1, FRAME]
        st, feats, Ex, silence = analysis_frames_scan(denoise_init(1), frames)
        return feats[:, 0], Ex[:, 0], silence[:, 0]

    feats_all = np.zeros((n_seq, n_frames, 42), np.float32)
    gains_all = np.zeros((n_seq, n_frames, NB_BANDS), np.float32)
    vad_all = np.zeros((n_seq, n_frames), np.float32)
    mask_all = np.zeros((n_seq, n_frames), np.float32)
    sil_all = np.zeros((n_seq, n_frames), bool)
    for i in range(n_seq):
        noisy, clean, active = make_mixture(rng, n_frames)
        fr_noisy = jnp.asarray(noisy.reshape(n_frames, 1, FRAME_SIZE) * 32767.0)
        fr_clean = jnp.asarray(clean.reshape(n_frames, 1, FRAME_SIZE) * 32767.0)
        feats, En, sil = analyze(fr_noisy)
        _, Ec, _ = analyze(fr_clean)
        # ideal ratio mask per band; energies carry a +1e-2 floor already
        g = np.sqrt(np.asarray(Ec) / np.asarray(En))
        gains_all[i] = np.clip(g, 0.0, 1.0)
        feats_all[i] = np.asarray(feats)
        vad_all[i] = active.reshape(n_frames, FRAME_SIZE).mean(axis=1) > 0.5
        sil_all[i] = np.asarray(sil)
        mask_all[i] = (~sil_all[i]).astype(np.float32)
        if progress and (i + 1) % 50 == 0:
            progress(f"dataset {i + 1}/{n_seq}")
    return feats_all, gains_all, vad_all, mask_all, sil_all


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def rnn_sequence(weights, feats, silence):
    """Scan the GRU stack over time with inference-exact silence freezing.

    feats [B,T,42], silence [B,T] -> (gains [B,T,22], vad [B,T]).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.rnnoise import (
        DENOISE_GRU_SIZE,
        NOISE_GRU_SIZE,
        VAD_GRU_SIZE,
        RnnState,
    )

    B = feats.shape[0]
    rnn0 = RnnState(
        vad_h=jnp.zeros((B, VAD_GRU_SIZE), jnp.float32),
        noise_h=jnp.zeros((B, NOISE_GRU_SIZE), jnp.float32),
        denoise_h=jnp.zeros((B, DENOISE_GRU_SIZE), jnp.float32),
    )

    def step(rnn, xs):
        f, sil = xs
        new_rnn, gains, vad = rnn_frame(rnn, weights, f)
        keep = sil[:, None]
        rnn = RnnState(
            vad_h=jnp.where(keep, rnn.vad_h, new_rnn.vad_h),
            noise_h=jnp.where(keep, rnn.noise_h, new_rnn.noise_h),
            denoise_h=jnp.where(keep, rnn.denoise_h, new_rnn.denoise_h),
        )
        return rnn, (gains, vad)

    _, (gains, vad) = jax.lax.scan(
        step, rnn0, (jnp.swapaxes(feats, 0, 1), jnp.swapaxes(silence, 0, 1)))
    return jnp.swapaxes(gains, 0, 1), jnp.swapaxes(vad, 0, 1)


def loss_fn(weights, feats, g_target, vad_target, mask, silence):
    import jax.numpy as jnp

    gains, vad = rnn_sequence(weights, feats, silence)
    m = mask[..., None]
    # RNNoise gain loss: MSE on sqrt-compressed gains (gamma = 0.5)
    gl = jnp.sum(m * (jnp.sqrt(gains) - jnp.sqrt(g_target)) ** 2) / (
        jnp.sum(m) * NB_BANDS + 1e-9)
    v = jnp.clip(vad, 1e-6, 1 - 1e-6)
    bce = -(vad_target * jnp.log(v) + (1 - vad_target) * jnp.log(1 - v))
    vl = jnp.sum(mask * bce) / (jnp.sum(mask) + 1e-9)
    return 10.0 * gl + 0.5 * vl, (gl, vl)


def train(n_seq: int = 480, n_frames: int = 150, steps: int = 3000,
          batch: int = 96, seed: int = 0, lr: float = 2e-3,
          log=print, dataset=None):
    """Train and return (weights dict of np.float32, final losses)."""
    import jax
    import jax.numpy as jnp
    import optax

    if dataset is None:
        dataset = build_dataset(n_seq, n_frames, seed=seed, progress=log)
    feats, g_t, vad_t, mask, sil = dataset
    n_seq = feats.shape[0]

    weights = {k: jnp.asarray(v) for k, v in random_weights(seed + 1).items()}
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05))
    opt_state = opt.init(weights)

    @jax.jit
    def step_fn(weights, opt_state, f, g, v, m, s):
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            weights, f, g, v, m, s)
        updates, opt_state = opt.update(grads, opt_state)
        weights = optax.apply_updates(weights, updates)
        return weights, opt_state, l, aux

    rng = np.random.RandomState(seed + 2)
    last = None
    for it in range(steps):
        idx = rng.choice(n_seq, size=min(batch, n_seq), replace=False)
        weights, opt_state, l, (gl, vl) = step_fn(
            weights, opt_state,
            jnp.asarray(feats[idx]), jnp.asarray(g_t[idx]),
            jnp.asarray(vad_t[idx]), jnp.asarray(mask[idx]),
            jnp.asarray(sil[idx]))
        last = (float(l), float(gl), float(vl))
        if (it + 1) % 100 == 0:
            log(f"step {it + 1}/{steps}: loss={last[0]:.4f} gain={last[1]:.4f} vad={last[2]:.4f}")
    return {k: np.asarray(v, np.float32) for k, v in weights.items()}, last


def save_weights(weights: dict, path: str) -> None:
    np.savez_compressed(path, **{k: weights[k] for k in WEIGHT_KEYS})


def main(argv=None):
    import jax

    jax.config.update("jax_platforms", "cpu")  # 87k params; keep the TPU free
    argv = argv if argv is not None else sys.argv[1:]
    out = argv[0] if argv else __file__.rsplit("/", 2)[0] + "/data/rnnoise_weights.npz"
    weights, last = train(log=lambda m: print(m, flush=True))
    save_weights(weights, out)
    print(f"saved {out}; final loss {last}")


if __name__ == "__main__":
    main()
