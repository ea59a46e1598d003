"""asr-lite: small-vocabulary speech recognition (log-mel + BiGRU + CTC).

The inference core behind the transcription elements' builtin model:
weights are TRAINED IN-REPO (models/asr_train.py) on the formant
synthesizer (ops/speechsynth.py), the same no-pretrained-checkpoint
strategy as rnnoise/demucs.  Reference element contract:
audio/whisper/src/whispertranscriber (imp.rs:84 model loading; chunked
transcription) — the builtin model replaces the GGUF checkpoint the
reference downloads, with a documented ~30-word command vocabulary.

TPU-native: features are batched matmuls/FFTs, the BiGRU runs as two
lax.scan passes, decoding is a device argmax + host collapse.  Everything
under `transcribe` is jittable except the final string assembly.
"""
from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

RATE = 16000
N_FFT = 512
WIN = 400  # 25 ms
HOP = 160  # 10 ms
N_MEL = 40

# CTC charset: 0 = blank, 1 = space, 2..27 = a..z
BLANK = 0
CHARS = " abcdefghijklmnopqrstuvwxyz"
N_CLASSES = 1 + len(CHARS)

HIDDEN = 96
DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "data", "asr_lite_weights.npz")


def text_to_ids(text: str) -> np.ndarray:
    return np.array([CHARS.index(c) + 1 for c in text if c in CHARS],
                    np.int32)


def ids_to_text(ids) -> str:
    return "".join(CHARS[int(i) - 1] for i in ids if int(i) >= 1)


def _mel_filterbank() -> np.ndarray:
    """[N_FFT//2+1, N_MEL] triangular mel filterbank (HTK mel scale)."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = imel(np.linspace(mel(0.0), mel(RATE / 2), N_MEL + 2))
    bins = np.floor((N_FFT + 1) * pts / RATE).astype(int)
    fb = np.zeros((N_FFT // 2 + 1, N_MEL), np.float32)
    for m in range(1, N_MEL + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[k, m - 1] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[k, m - 1] = (hi - k) / (hi - ctr)
    return fb


_MEL = jnp.asarray(_mel_filterbank())
_WINDOW = jnp.asarray(np.hanning(WIN).astype(np.float32))


def logmel(audio: jnp.ndarray) -> jnp.ndarray:
    """[n] f32 -> [T, N_MEL] log-mel features with per-utterance CMVN."""
    n = audio.shape[0]
    t = max(1, (n - WIN) // HOP + 1)
    idx = jnp.arange(t)[:, None] * HOP + jnp.arange(WIN)[None, :]
    frames = audio[idx] * _WINDOW
    spec = jnp.abs(jnp.fft.rfft(frames, n=N_FFT)) ** 2
    mels = jnp.log(spec @ _MEL + 1e-6)
    mean = jnp.mean(mels, axis=0, keepdims=True)
    std = jnp.std(mels, axis=0, keepdims=True) + 1e-3
    return (mels - mean) / std


def logmel_np(audio: np.ndarray) -> np.ndarray:
    """numpy twin of logmel (for fast dataset building; same math)."""
    audio = np.asarray(audio, np.float32)
    n = audio.shape[0]
    t = max(1, (n - WIN) // HOP + 1)
    idx = np.arange(t)[:, None] * HOP + np.arange(WIN)[None, :]
    frames = audio[idx] * np.asarray(_WINDOW)
    spec = np.abs(np.fft.rfft(frames, n=N_FFT)) ** 2
    mels = np.log(spec @ np.asarray(_MEL) + 1e-6)
    mean = mels.mean(axis=0, keepdims=True)
    std = mels.std(axis=0, keepdims=True) + 1e-3
    return ((mels - mean) / std).astype(np.float32)


def init_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(i, o):
        return (rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)

    w: Dict[str, np.ndarray] = {}
    dims = [(N_MEL, HIDDEN), (2 * HIDDEN, HIDDEN)]
    for layer, (i_dim, h) in enumerate(dims):
        for d in ("f", "b"):
            p = f"gru{layer}{d}_"
            w[p + "wz"] = mat(i_dim + h, h)
            w[p + "wr"] = mat(i_dim + h, h)
            w[p + "wh"] = mat(i_dim + h, h)
            w[p + "bz"] = np.zeros(h, np.float32)
            w[p + "br"] = np.zeros(h, np.float32)
            w[p + "bh"] = np.zeros(h, np.float32)
    w["out_w"] = mat(2 * HIDDEN, N_CLASSES)
    w["out_b"] = np.zeros(N_CLASSES, np.float32)
    return w


def _gru_scan(w, prefix: str, xs: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """xs [T, D] -> hidden sequence [T, H] (single direction)."""
    h0 = jnp.zeros(w[prefix + "wz"].shape[1], xs.dtype)

    def cell(h, x):
        xh = jnp.concatenate([x, h])
        z = jax.nn.sigmoid(xh @ w[prefix + "wz"] + w[prefix + "bz"])
        r = jax.nn.sigmoid(xh @ w[prefix + "wr"] + w[prefix + "br"])
        xrh = jnp.concatenate([x, r * h])
        hh = jnp.tanh(xrh @ w[prefix + "wh"] + w[prefix + "bh"])
        h2 = (1 - z) * h + z * hh
        return h2, h2

    _, hs = jax.lax.scan(cell, h0, xs, reverse=reverse)
    return hs


def forward(w, feats: jnp.ndarray) -> jnp.ndarray:
    """[T, N_MEL] -> logits [T, N_CLASSES]."""
    x = feats
    for layer in range(2):
        f = _gru_scan(w, f"gru{layer}f_", x, reverse=False)
        b = _gru_scan(w, f"gru{layer}b_", x, reverse=True)
        x = jnp.concatenate([f, b], axis=-1)
    return x @ w["out_w"] + w["out_b"]


forward_jit = jax.jit(forward)


def greedy_ids(logits: np.ndarray) -> List[int]:
    """CTC greedy decode: collapse repeats, drop blanks."""
    path = np.asarray(logits).argmax(axis=-1)
    out: List[int] = []
    prev = -1
    for p in path:
        if p != prev and p != BLANK:
            out.append(int(p))
        prev = p
    return out


def transcribe(w, audio: np.ndarray) -> str:
    """[n] f32 16 kHz -> text (lower-case words from the vocabulary)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    feats = np.asarray(logmel(jnp.asarray(audio)))
    t = feats.shape[0]
    # bucket-pad the FEATURES (zero rows, same as training's fpad region)
    # so forward_jit compiles a handful of shapes, then decode only the
    # true frames — the padded region never contributed to training loss
    bucket = 50  # 0.5 s of frames
    tp = max(bucket, -(-t // bucket) * bucket)
    if tp != t:
        feats = np.pad(feats, ((0, tp - t), (0, 0)))
    logits = forward_jit(w, jnp.asarray(feats))
    return ids_to_text(greedy_ids(np.asarray(logits)[:t])).strip()


def load_weights(path: str = DEFAULT_WEIGHTS) -> Dict[str, jnp.ndarray]:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def save_weights(w: Dict[str, np.ndarray], path: str = DEFAULT_WEIGHTS) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in w.items()})


__all__ = ["BLANK", "CHARS", "N_CLASSES", "N_MEL", "forward", "forward_jit",
           "greedy_ids", "ids_to_text", "init_weights", "load_weights",
           "logmel", "logmel_np", "save_weights", "text_to_ids", "transcribe",
           "DEFAULT_WEIGHTS"]
