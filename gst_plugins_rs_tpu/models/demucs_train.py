"""In-repo Demucs trainer — makes the demucs element actually separate.

The reference element runs Meta's pretrained htdemucs (audio/demucs);
those weights cannot be downloaded here, so the demucs-lite config
(models/demucs.py) is trained from scratch on SYNTHETIC 4-stem mixtures
with the published time-domain L1 stem loss (Defossez et al., "Music
Source Separation in the Waveform Domain").  The stems are built to
occupy the bands/textures their names imply:

- drums:  noise bursts with fast exponential decay at a tempo grid
- bass:   low sine/saw lines, 40-120 Hz, slow note changes
- other:  mid-range harmonic chords (stacked sines 200-1000 Hz)
- vocals: formant-filtered glottal speech (rnnoise_train's synthesizer)

A separator trained on these obviously does not rival pretrained Demucs
on real music; it demonstrates a FUNCTIONING end-to-end separation path
(committed weights, held-out SI-SNR gains on each stem) the same way the
in-repo-trained RNNoise weights make audiornnoise functional.

Run:  python -m gst_plugins_rs_tpu.models.demucs_train [out.npz]
(roughly 30-45 min on CPU; forces the CPU backend).
"""
from __future__ import annotations

import sys

import numpy as np

from .demucs import SOURCES, DemucsConfig, init_params, make_apply, save_npz

SR = 44100


def synth_drums(rng: np.random.RandomState, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    period = rng.randint(int(0.2 * SR), int(0.5 * SR))
    t0 = rng.randint(0, period)
    decay = np.exp(-np.arange(int(0.08 * SR)) / (0.015 * SR)).astype(np.float32)
    while t0 < n:
        burst = rng.randn(len(decay)).astype(np.float32) * decay
        end = min(n, t0 + len(burst))
        out[t0:end] += burst[:end - t0] * rng.uniform(0.5, 1.0)
        t0 += period
    return out


def synth_bass(rng: np.random.RandomState, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    t = 0
    phase = 0.0
    while t < n:
        dur = rng.randint(int(0.3 * SR), int(0.8 * SR))
        f0 = rng.uniform(40, 120)
        tt = np.arange(min(dur, n - t))
        ph = phase + 2 * np.pi * f0 * tt / SR
        wave = np.sin(ph) + 0.3 * np.sin(2 * ph)  # saw-ish
        env = np.minimum(1.0, tt / (0.01 * SR)) * np.exp(-tt / (0.6 * SR))
        out[t:t + len(tt)] = (wave * env).astype(np.float32)
        phase = ph[-1] if len(ph) else phase
        t += dur
    return out * 0.8


def synth_other(rng: np.random.RandomState, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    t = 0
    while t < n:
        dur = rng.randint(int(0.4 * SR), int(1.0 * SR))
        tt = np.arange(min(dur, n - t))
        chord = np.zeros(len(tt), np.float32)
        root = rng.uniform(200, 500)
        for ratio in (1.0, 1.25, 1.5):
            chord += np.sin(2 * np.pi * root * ratio * tt / SR
                            + rng.uniform(0, 6.28)).astype(np.float32)
        env = np.minimum(1.0, tt / (0.02 * SR))
        out[t:t + len(tt)] = chord * env / 3.0
        t += dur
    return out * 0.6


def synth_vocals(rng: np.random.RandomState, n: int) -> np.ndarray:
    from .rnnoise_train import synth_speech

    # rnnoise's synthesizer runs at 48 kHz; the band structure is close
    # enough at 44.1 kHz for a synthetic vocal stem
    v, _ = synth_speech(rng, n)
    return v.astype(np.float32)


_SYNTH = {"drums": synth_drums, "bass": synth_bass,
          "other": synth_other, "vocals": synth_vocals}


def make_example(rng: np.random.RandomState, length: int):
    """(mix [T, 2], stems [S, T, 2]) with random per-stem gains/panning."""
    stems = []
    for src in SOURCES:
        mono = _SYNTH[src](rng, length)
        gain = rng.uniform(0.5, 1.0)
        pan = rng.uniform(0.3, 0.7)
        stereo = np.stack([mono * gain * (1 - pan), mono * gain * pan], axis=1)
        stems.append(stereo)
    stems = np.stack(stems)  # [S, T, 2]
    mix = np.clip(stems.sum(axis=0), -1.0, 1.0)
    return mix.astype(np.float32), stems.astype(np.float32)


def train(steps: int = 800, batch: int = 4, seg: int = 44100, seed: int = 0,
          lr: float = 3e-4, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    cfg = DemucsConfig(**{"channels": 16, "depth": 4, "lstm_layers": 1})
    length = cfg.valid_length(seg)
    params = init_params(cfg, seed)
    model_apply = make_apply(cfg)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, mix, stems):
        def loss_fn(p):
            out = model_apply(p, mix)  # [B, S, T, C]
            err = jnp.abs(out - stems)
            # normalize per stem by its energy so sparse/quiet stems
            # (drums bursts) carry the same gradient weight as dense ones
            scale = jnp.mean(jnp.abs(stems), axis=(0, 2, 3), keepdims=True) + 1e-3
            return jnp.mean(err / scale)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed + 1)
    last = None
    for it in range(steps):
        mixes, stems = [], []
        for _ in range(batch):
            m, s = make_example(rng, length)
            mixes.append(m)
            stems.append(s)  # [S, T, 2]
        mix = jnp.asarray(np.stack(mixes))
        tgt = jnp.asarray(np.stack(stems))
        params, opt_state, loss = step_fn(params, opt_state, mix, tgt)
        last = float(loss)
        if (it + 1) % 50 == 0:
            log(f"step {it + 1}/{steps}: L1={last:.5f}")
    return cfg, params, last


def evaluate(cfg, params, trials: int = 4, seed: int = 999, log=print):
    """Held-out per-stem SI-SNR improvement over using the mixture."""
    import jax.numpy as jnp

    model_apply = make_apply(cfg)
    rng = np.random.RandomState(seed)
    length = cfg.valid_length(44100)

    def si_snr(est, ref):
        ref = ref - ref.mean()
        est = est - est.mean()
        s = (est * ref).sum() * ref / ((ref * ref).sum() + 1e-9)
        e = est - s
        return 10 * np.log10(((s * s).sum() + 1e-9) / ((e * e).sum() + 1e-9))

    gains = {src: [] for src in SOURCES}
    for _ in range(trials):
        mix, stems = make_example(rng, length)
        out = np.asarray(model_apply(params, jnp.asarray(mix[None])))[0]
        for si, src in enumerate(SOURCES):
            ref = stems[si]
            base = si_snr(mix, ref)
            sep = si_snr(out[si], ref)
            gains[src].append(sep - base)
    means = {src: float(np.mean(v)) for src, v in gains.items()}
    log(f"SI-SNR improvement per stem: "
        + ", ".join(f"{s}={m:.1f} dB" for s, m in means.items()))
    return means


def main(argv=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    argv = argv if argv is not None else sys.argv[1:]
    out = argv[0] if argv else __file__.rsplit("/", 2)[0] + "/data/demucs_lite_weights.npz"
    cfg, params, last = train(log=lambda m: print(m, flush=True))
    save_npz(out, params)
    print(f"saved {out}; final L1 {last:.5f}")
    evaluate(cfg, params, log=lambda m: print(m, flush=True))


if __name__ == "__main__":
    main()
