"""Train the asr-lite builtin model (ops/asr.py) from scratch.

Data: the formant synthesizer (ops/speechsynth.py) — random 1-4-word
command sentences with per-speaker pitch/formant/rate variation and
additive noise (SNR 12-40 dB).  Loss: optax.ctc_loss over the character
charset.  Runs on CPU in ~20-40 min; weights land in
data/asr_lite_weights.npz and are loaded by the transcriber elements by
default (the rnnoise/demucs in-repo-weights pattern).

    python -m gst_plugins_rs_tpu.models.asr_train [steps]
"""
from __future__ import annotations

import sys
import time
from typing import List, Tuple

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ..ops import asr  # noqa: E402
from ..ops.speechsynth import VOCABULARY, synth_sentence  # noqa: E402

MAX_T = 420  # frames (~4.2 s)
MAX_L = 28  # label chars


def make_example(seed: int) -> Tuple[np.ndarray, str]:
    rng = np.random.default_rng(seed)
    n_words = int(rng.integers(1, 5))
    words = [VOCABULARY[int(rng.integers(len(VOCABULARY)))]
             for _ in range(n_words)]
    snr = float(rng.uniform(12, 40))
    audio = synth_sentence(words, seed=seed, noise_snr_db=snr)
    return audio, " ".join(words)


def build_batch(seeds: List[int]):
    feats = np.zeros((len(seeds), MAX_T, asr.N_MEL), np.float32)
    fpad = np.ones((len(seeds), MAX_T), np.float32)
    labels = np.zeros((len(seeds), MAX_L), np.int32)
    lpad = np.ones((len(seeds), MAX_L), np.float32)
    for i, seed in enumerate(seeds):
        audio, text = make_example(seed)
        f = asr.logmel_np(audio)
        t = min(f.shape[0], MAX_T)
        feats[i, :t] = f[:t]
        fpad[i, :t] = 0.0
        ids = asr.text_to_ids(text)[:MAX_L]
        labels[i, : len(ids)] = ids
        lpad[i, : len(ids)] = 0.0
    return feats, fpad, labels, lpad


def loss_fn(w, feats, fpad, labels, lpad):
    logits = jax.vmap(lambda f: asr.forward(w, f))(feats)
    per = optax.ctc_loss(logits, fpad, labels, lpad, blank_id=asr.BLANK)
    return jnp.mean(per)


def evaluate(w, n: int = 40, seed0: int = 10_000_000) -> Tuple[float, float]:
    """(sentence accuracy, word accuracy) on held-out seeds."""
    sent_ok = 0
    words_ok = 0
    words_all = 0
    for k in range(n):
        audio, text = make_example(seed0 + k)
        hyp = asr.transcribe(w, audio)
        sent_ok += int(hyp == text)
        ref_words = text.split()
        hyp_words = hyp.split()
        words_all += len(ref_words)
        words_ok += sum(a == b for a, b in zip(ref_words, hyp_words))
    return sent_ok / n, words_ok / max(1, words_all)


def train(steps: int = 1500, batch: int = 16, lr: float = 2e-3,
          seed: int = 0, log_every: int = 50, dataset_size: int = 3000):
    # pre-generate the dataset once (synthesis dominates per-step cost on
    # this single-core box) and sample batches from the cache
    t0 = time.time()
    all_feats, all_fpad, all_labels, all_lpad = build_batch(
        list(range(dataset_size)))
    print(f"dataset: {dataset_size} examples in {time.time() - t0:.0f}s",
          flush=True)

    w = {k: jnp.asarray(v) for k, v in asr.init_weights(seed).items()}
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05))
    opt_state = opt.init(w)

    @jax.jit
    def step_fn(w, opt_state, feats, fpad, labels, lpad):
        loss, grads = jax.value_and_grad(loss_fn)(w, feats, fpad, labels, lpad)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(w, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(0, dataset_size, batch)
        w, opt_state, loss = step_fn(
            w, opt_state, jnp.asarray(all_feats[idx]),
            jnp.asarray(all_fpad[idx]), jnp.asarray(all_labels[idx]),
            jnp.asarray(all_lpad[idx]))
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it:5d} loss {float(loss):8.4f} "
                  f"({time.time() - t0:6.1f}s)", flush=True)
    return w


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    steps = int(argv[0]) if argv else 1500
    w = train(steps=steps)
    sacc, wacc = evaluate(w)
    print(f"heldout: sentence acc {sacc:.3f}, word acc {wacc:.3f}")
    asr.save_weights(w)
    print(f"saved {asr.DEFAULT_WEIGHTS}")


if __name__ == "__main__":
    main()
