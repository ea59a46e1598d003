"""RNNoise-architecture denoiser (audiornnoise compute path).

Reimplements the `nnnoiseless` crate's DenoiseState (SURVEY.md §2.4): 480
sample frames, 960-sample vorbis-windowed FFT analysis, 22 Bark-ish band
energies (eband5ms layout), 42-feature front end (22 BFCC + 2x6 deltas +
6 pitch-correlation cepstra + pitch period + spectral variability), GRU stack
(dense 24 tanh -> vad GRU 24 -> noise GRU 48 -> denoise GRU 96 -> 22 sigmoid
band gains + sigmoid VAD), band-gain interpolation and overlap-add synthesis.

Silence frames bypass the network entirely and reproduce the (delayed) input
spectrum — zeros in, zeros out, exactly like the reference element's test
contract (audio/audiofx/tests/audiornnoise.rs:38-80).

Weights load from an .npz (see WEIGHT_KEYS); without a file a deterministic
random init is used — the architecture and streaming semantics are exact, the
trained RNNoise weights are embedded in the nnnoiseless binary and not
redistributable here.  Pitch analysis uses FFT autocorrelation over the
reference's pitch window/period ranges (a documented simplification of
RNNoise's two-stage cross-correlation search).

TPU-native: one jitted step processes [C channels x K frames] per dispatch;
frames advance via lax.scan, channels via vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

FRAME_SIZE = 480
WINDOW_SIZE = 960
FREQ_SIZE = 481
NB_BANDS = 22
CEPS_MEM = 8
NB_DELTA_CEPS = 6
NB_FEATURES = NB_BANDS + 3 * NB_DELTA_CEPS + 2  # 42

PITCH_MIN_PERIOD = 60
PITCH_MAX_PERIOD = 768
PITCH_FRAME_SIZE = 960
PITCH_BUF_SIZE = PITCH_MAX_PERIOD + PITCH_FRAME_SIZE

# band edges in 5 ms units; bin index = eband5ms * 4 (RNNoise layout)
EBAND5MS = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40, 48, 60, 78, 100]
)

# input high-pass biquad (RNNoise constants)
HP_B = np.array([-1.99599, 0.99600])
HP_A = np.array([-1.98989, 0.98997])


def vorbis_window() -> np.ndarray:
    i = np.arange(WINDOW_SIZE // 2)
    inner = np.sin(0.5 * np.pi * (i + 0.5) / (WINDOW_SIZE // 2))
    half = np.sin(0.5 * np.pi * inner * inner)
    return np.concatenate([half, half[::-1]]).astype(np.float32)


def _band_matrix() -> np.ndarray:
    """[NB_BANDS, FREQ_SIZE] triangular interpolation weights."""
    m = np.zeros((NB_BANDS, FREQ_SIZE), np.float32)
    for b in range(NB_BANDS - 1):
        lo = EBAND5MS[b] * 4
        hi = EBAND5MS[b + 1] * 4
        size = hi - lo
        for j in range(size):
            frac = j / size
            m[b, lo + j] += 1.0 - frac
            m[b + 1, lo + j] += frac
    # DC and nyquist band scaling like RNNoise compute_band_energy (the first
    # and last bands only get half a triangle)
    return m


def _dct_matrix() -> np.ndarray:
    """[NB_BANDS, NB_BANDS] orthonormal DCT-II (RNNoise dct())."""
    n = NB_BANDS
    m = np.zeros((n, n), np.float64)
    for i in range(n):
        for k in range(n):
            m[k, i] = np.cos(np.pi * (i + 0.5) * k / n)
    m *= np.sqrt(2.0 / n)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------
WEIGHT_KEYS = [
    "input_dense_w",  # [42, 24]
    "input_dense_b",  # [24]
    "vad_gru_w",  # [24, 3*24]  (z|r|h)
    "vad_gru_u",  # [24, 3*24]
    "vad_gru_b",  # [3*24]
    "noise_gru_w",  # [90, 3*48]
    "noise_gru_u",  # [48, 3*48]
    "noise_gru_b",  # [3*48]
    "denoise_gru_w",  # [114, 3*96]
    "denoise_gru_u",  # [96, 3*96]
    "denoise_gru_b",  # [3*96]
    "denoise_output_w",  # [96, 22]
    "denoise_output_b",  # [22]
    "vad_output_w",  # [24, 1]
    "vad_output_b",  # [1]
]

VAD_GRU_SIZE = 24
NOISE_GRU_SIZE = 48
DENOISE_GRU_SIZE = 96


def random_weights(seed: int = 0) -> dict:
    """Deterministic random init (placeholder for trained RNNoise weights)."""
    rng = np.random.RandomState(seed)
    shapes = {
        "input_dense_w": (NB_FEATURES, 24),
        "input_dense_b": (24,),
        "vad_gru_w": (24, 3 * VAD_GRU_SIZE),
        "vad_gru_u": (VAD_GRU_SIZE, 3 * VAD_GRU_SIZE),
        "vad_gru_b": (3 * VAD_GRU_SIZE,),
        "noise_gru_w": (24 + VAD_GRU_SIZE + NB_FEATURES, 3 * NOISE_GRU_SIZE),
        "noise_gru_u": (NOISE_GRU_SIZE, 3 * NOISE_GRU_SIZE),
        "noise_gru_b": (3 * NOISE_GRU_SIZE,),
        "denoise_gru_w": (VAD_GRU_SIZE + NOISE_GRU_SIZE + NB_FEATURES, 3 * DENOISE_GRU_SIZE),
        "denoise_gru_u": (DENOISE_GRU_SIZE, 3 * DENOISE_GRU_SIZE),
        "denoise_gru_b": (3 * DENOISE_GRU_SIZE,),
        "denoise_output_w": (DENOISE_GRU_SIZE, NB_BANDS),
        "denoise_output_b": (NB_BANDS,),
        "vad_output_w": (VAD_GRU_SIZE, 1),
        "vad_output_b": (1,),
    }
    return {k: rng.uniform(-0.1, 0.1, s).astype(np.float32) for k, s in shapes.items()}


def load_weights(path: str) -> dict:
    data = np.load(path)
    return {k: np.asarray(data[k], np.float32) for k in WEIGHT_KEYS}


def _gru(x, h, w, u, b, size: int, activation=jnp.tanh):
    """RNNoise-ordered GRU: gates packed as [z | r | h~]."""
    gx = x @ w + b
    gh = h @ u
    z = jax.nn.sigmoid(gx[..., :size] + gh[..., :size])
    r = jax.nn.sigmoid(gx[..., size : 2 * size] + gh[..., size : 2 * size])
    hh = activation(gx[..., 2 * size :] + r * gh[..., 2 * size :])
    return z * h + (1.0 - z) * hh


class RnnState(NamedTuple):
    vad_h: jnp.ndarray  # [C, 24]
    noise_h: jnp.ndarray  # [C, 48]
    denoise_h: jnp.ndarray  # [C, 96]


class DenoiseState(NamedTuple):
    analysis_mem: jnp.ndarray  # [C, FRAME]
    synthesis_mem: jnp.ndarray  # [C, FRAME]
    pitch_buf: jnp.ndarray  # [C, PITCH_BUF_SIZE]
    cepstral_hist: jnp.ndarray  # [C, CEPS_MEM, NB_BANDS]
    ceps_idx: jnp.ndarray  # i32
    hp_mem: jnp.ndarray  # [C, 4] biquad x1,x2,y1,y2
    rnn: RnnState


def denoise_init(channels: int) -> DenoiseState:
    return DenoiseState(
        analysis_mem=jnp.zeros((channels, FRAME_SIZE), jnp.float32),
        synthesis_mem=jnp.zeros((channels, FRAME_SIZE), jnp.float32),
        pitch_buf=jnp.zeros((channels, PITCH_BUF_SIZE), jnp.float32),
        cepstral_hist=jnp.zeros((channels, CEPS_MEM, NB_BANDS), jnp.float32),
        ceps_idx=jnp.zeros((), jnp.int32),
        hp_mem=jnp.zeros((channels, 4), jnp.float32),
        rnn=RnnState(
            vad_h=jnp.zeros((channels, VAD_GRU_SIZE), jnp.float32),
            noise_h=jnp.zeros((channels, NOISE_GRU_SIZE), jnp.float32),
            denoise_h=jnp.zeros((channels, DENOISE_GRU_SIZE), jnp.float32),
        ),
    )


_WINDOW = jnp.asarray(vorbis_window())
_BANDS = jnp.asarray(_band_matrix())
_DCT = jnp.asarray(_dct_matrix())


def _forward_transform(buf):
    """buf: [C, WINDOW] -> (Xr, Xi) [C, FREQ] (windowed rfft as real pairs;
    see ops/rfft.py for why complex dtypes are avoided)."""
    from .rfft import rfft_pair

    Xr, Xi = rfft_pair(buf * _WINDOW, WINDOW_SIZE)
    return Xr / WINDOW_SIZE, Xi / WINDOW_SIZE


def _inverse_transform(Xr, Xi):
    from .rfft import irfft_pair

    y = irfft_pair(Xr, Xi, WINDOW_SIZE) * WINDOW_SIZE
    return y * _WINDOW


def _band_energy(Xr, Xi):
    return (_BANDS @ (Xr * Xr + Xi * Xi).T).T + 1e-2  # [C, NB_BANDS]


def _interp_band_gain(g):
    """Expand per-band gains to per-bin gains (linear within bands)."""
    return g @ _BANDS  # [C, FREQ]  (triangular weights sum to 1 inside bands)


def _pitch_search(pitch_buf):
    """FFT autocorrelation pitch: period in [PITCH_MIN, PITCH_MAX] and
    normalized correlation gain.  pitch_buf: [C, PITCH_BUF]."""
    from .rfft import irfft_pair, rfft_pair

    x = pitch_buf - jnp.mean(pitch_buf, axis=-1, keepdims=True)
    n = PITCH_BUF_SIZE
    fft_len = 4096
    Fr, Fi = rfft_pair(x, fft_len)
    # F * conj(F) = |F|^2 (real) -> autocorrelation
    ac = irfft_pair(Fr * Fr + Fi * Fi, jnp.zeros_like(Fr), fft_len)[:, :n]
    lags = jnp.arange(n)
    valid = (lags >= PITCH_MIN_PERIOD) & (lags <= PITCH_MAX_PERIOD)
    score = jnp.where(valid[None, :], ac, -jnp.inf)
    period = jnp.argmax(score, axis=-1)  # [C]
    e0 = ac[:, 0]
    gain = jnp.clip(jnp.take_along_axis(ac, period[:, None], axis=-1)[:, 0] / jnp.maximum(e0, 1e-9), 0.0, 1.0)
    return period, gain


def analysis_frame(state: DenoiseState, x):
    """Weight-independent feature front end for one 480-sample frame.

    x: [C, FRAME] (scaled to +-32767).  Returns
    (state' with rnn untouched, features [C, 42], Ex [C, NB_BANDS],
    Xr, Xi [C, FREQ], silence [C]).  Shared verbatim by inference
    (denoise_frame) and the in-repo trainer (models/rnnoise_train.py) so
    trained weights see exactly the deployed features.
    """
    # input high-pass biquad (per channel, 480 samples — tiny host-free scan)
    hb = HP_B.astype(np.float32)
    ha = HP_A.astype(np.float32)

    def hp_step(mem, xn):
        x1, x2, y1, y2 = mem[:, 0], mem[:, 1], mem[:, 2], mem[:, 3]
        y = xn + hb[0] * x1 + hb[1] * x2 - ha[0] * y1 - ha[1] * y2
        return jnp.stack([xn, x1, y, y1], axis=1).astype(mem.dtype), y

    hp_mem, xf = jax.lax.scan(hp_step, state.hp_mem, x.T)
    xf = xf.T  # [C, FRAME]

    # analysis
    buf = jnp.concatenate([state.analysis_mem, xf], axis=-1)  # [C, WINDOW]
    Xr, Xi = _forward_transform(buf)
    Ex = _band_energy(Xr, Xi)

    # pitch buffer shift + features
    pitch_buf = jnp.concatenate([state.pitch_buf[:, FRAME_SIZE:], xf], axis=-1)
    period, pitch_gain = _pitch_search(pitch_buf)

    # silence detection: energy of the frame (RNNoise checks band energy sum)
    E = jnp.sum(Ex - 1e-2, axis=-1)
    silence = E < 1e-1  # [C]

    # BFCC
    log_e = jnp.log10(Ex)
    ceps = log_e @ _DCT.T  # [C, NB_BANDS]
    hist = state.cepstral_hist
    idx = state.ceps_idx
    prev1 = hist[:, (idx - 1) % CEPS_MEM]
    prev2 = hist[:, (idx - 2) % CEPS_MEM]
    hist = hist.at[:, idx % CEPS_MEM].set(ceps)

    d1 = ceps[:, :NB_DELTA_CEPS] - prev2[:, :NB_DELTA_CEPS]
    d2 = ceps[:, :NB_DELTA_CEPS] - 2 * prev1[:, :NB_DELTA_CEPS] + prev2[:, :NB_DELTA_CEPS]
    # pitch-correlation cepstra: correlation of spectrum with pitch-delayed
    # signal approximated by the pitch gain spread over the first 6 cepstra
    pitch_ceps = pitch_gain[:, None] * ceps[:, :NB_DELTA_CEPS]
    spec_var = jnp.var(hist, axis=1).mean(axis=-1, keepdims=True)
    features = jnp.concatenate(
        [
            ceps,
            d1,
            d2,
            pitch_ceps,
            (period[:, None].astype(jnp.float32) / 256.0 - 1.5),
            spec_var,
        ],
        axis=-1,
    )  # [C, 42]

    new_state = DenoiseState(
        analysis_mem=xf,
        synthesis_mem=state.synthesis_mem,
        pitch_buf=pitch_buf,
        cepstral_hist=hist,
        ceps_idx=(idx + 1) % CEPS_MEM,
        hp_mem=hp_mem,
        rnn=state.rnn,
    )
    return new_state, features, Ex, Xr, Xi, silence


def rnn_frame(rnn: RnnState, weights: dict, features):
    """One GRU-stack step: features [C, 42] -> (rnn', gains [C, 22], vad [C]).

    Differentiable in `weights` — the trainer scans this over time.
    """
    w = weights
    dense = jnp.tanh(features @ w["input_dense_w"] + w["input_dense_b"])
    vad_h = _gru(dense, rnn.vad_h, w["vad_gru_w"], w["vad_gru_u"], w["vad_gru_b"], VAD_GRU_SIZE)
    noise_in = jnp.concatenate([dense, vad_h, features], axis=-1)
    noise_h = _gru(noise_in, rnn.noise_h, w["noise_gru_w"], w["noise_gru_u"], w["noise_gru_b"], NOISE_GRU_SIZE, jax.nn.relu)
    den_in = jnp.concatenate([vad_h, noise_h, features], axis=-1)
    denoise_h = _gru(den_in, rnn.denoise_h, w["denoise_gru_w"], w["denoise_gru_u"], w["denoise_gru_b"], DENOISE_GRU_SIZE, jax.nn.relu)
    gains = jax.nn.sigmoid(denoise_h @ w["denoise_output_w"] + w["denoise_output_b"])
    vad = jax.nn.sigmoid(vad_h @ w["vad_output_w"] + w["vad_output_b"])[:, 0]  # [C]
    return RnnState(vad_h=vad_h, noise_h=noise_h, denoise_h=denoise_h), gains, vad


def denoise_frame(state: DenoiseState, weights: dict, x):
    """Process one 480-sample frame per channel.  x: [C, FRAME] (scaled to
    +-32767 like the reference element).  Returns (state', out [C, FRAME],
    vad [C])."""
    state, features, Ex, Xr, Xi, silence = analysis_frame(state, x)
    new_rnn, gains, vad = rnn_frame(state.rnn, weights, features)

    # silence frames skip the network entirely (state frozen, vad 0) and pass
    # the spectrum through — RNNoise's `if !silence` structure
    vad = jnp.where(silence, 0.0, vad)
    vad_h = jnp.where(silence[:, None], state.rnn.vad_h, new_rnn.vad_h)
    noise_h = jnp.where(silence[:, None], state.rnn.noise_h, new_rnn.noise_h)
    denoise_h = jnp.where(silence[:, None], state.rnn.denoise_h, new_rnn.denoise_h)
    gain_bins = _interp_band_gain(gains)  # [C, FREQ]
    Xor = jnp.where(silence[:, None], Xr, Xr * gain_bins)
    Xoi = jnp.where(silence[:, None], Xi, Xi * gain_bins)

    # synthesis: overlap-add
    y = _inverse_transform(Xor, Xoi)  # [C, WINDOW]
    out = y[:, :FRAME_SIZE] + state.synthesis_mem
    new_state = state._replace(
        synthesis_mem=y[:, FRAME_SIZE:],
        rnn=RnnState(vad_h=vad_h, noise_h=noise_h, denoise_h=denoise_h),
    )
    return new_state, out, vad


def denoise_frames_scan(state: DenoiseState, weights: dict, frames):
    """frames: [K, C, FRAME] -> (state', outs [K, C, FRAME], vads [K, C])."""

    def step(s, fr):
        s, out, vad = denoise_frame(s, weights, fr)
        return s, (out, vad)

    state, (outs, vads) = jax.lax.scan(step, state, frames)
    return state, outs, vads


denoise_frames_scan_jit = jax.jit(denoise_frames_scan)


def analysis_frames_scan(state: DenoiseState, frames):
    """Feature front end over a frame sequence (no network, no synthesis).

    frames: [K, C, FRAME] -> (state', features [K, C, 42], Ex [K, C, 22],
    silence [K, C]).  Used by the trainer to precompute features/targets.
    """

    def step(s, fr):
        s, feats, Ex, _, _, silence = analysis_frame(s, fr)
        return s, (feats, Ex, silence)

    state, (feats, Ex, silence) = jax.lax.scan(step, state, frames)
    return state, feats, Ex, silence


# ---------------------------------------------------------------------------
# Batched-front-end fast path
# ---------------------------------------------------------------------------
#
# The per-frame scan above serializes 480 HP-biquad sample steps plus two
# FFTs per frame.  Only the GRU recurrence is truly sequential: given the
# whole input block, the HP filter blocks into per-frame matmuls
# (ebur128.py blocked-IIR machinery), analysis windows/pitch windows are
# slices of the known signal, and the cepstral history at frame t is just
# the last 8 ceps values — all computable batched.  denoise_frames_fast
# runs the front end as ONE batched dispatch and scans only the
# (tiny-matmul) GRU stack, then batches synthesis/overlap-add.  Measured
# equivalent to denoise_frames_scan within float tolerance
# (tests/test_audiornnoise.py::test_fast_path_matches_scan).


def _hp_block_mats():
    from .ebur128 import _biquad_block_mats

    b = np.array([1.0, HP_B[0], HP_B[1]], np.float64)
    a = np.array([1.0, HP_A[0], HP_A[1]], np.float64)
    return _biquad_block_mats(b, a, FRAME_SIZE)


def _hp_filter_batch(hp_mem, frames):
    """frames [K, C, FRAME] -> (filtered [K, C, FRAME], hp_mem')
    via per-frame blocked-IIR matmuls (exact state carry)."""
    T, S0, G, AB = _hp_block_mats()
    Tj, S0j, Gj, ABj = (jnp.asarray(m, jnp.float32) for m in (T, S0, G, AB))
    hp = jax.lax.Precision.HIGHEST
    b1, b2 = float(HP_B[0]), float(HP_B[1])
    a1, a2 = float(HP_A[0]), float(HP_A[1])
    x1, x2, y1, y2 = (hp_mem[:, i] for i in range(4))
    # direct-form-I memory -> DF2T state [2, C]
    s1 = b1 * x1 - a1 * y1 + b2 * x2 - a2 * y2
    s2 = b2 * x1 - a2 * y1
    zi = jnp.stack([s1, s2])

    def step(s, xf):  # xf [C, FRAME]
        x = xf.T  # [FRAME, C]
        y = jnp.dot(Tj, x, precision=hp) + jnp.dot(S0j, s, precision=hp)
        s_next = jnp.dot(ABj, s, precision=hp) + jnp.dot(Gj, x, precision=hp)
        return s_next, y.T

    _, ys = jax.lax.scan(step, zi, frames)
    hp_mem_out = jnp.stack(
        [frames[-1, :, -1], frames[-1, :, -2], ys[-1, :, -1], ys[-1, :, -2]],
        axis=1)
    return ys, hp_mem_out


def analysis_frames_batch(state: DenoiseState, frames):
    """Batched front end: frames [K, C, FRAME] ->
    (state', features [K,C,42], Ex, Xr, Xi [K,C,...], silence [K,C]).
    Same math as scanning analysis_frame, without the per-frame scan."""
    K, C, _ = frames.shape
    xf, hp_mem = _hp_filter_batch(state.hp_mem, frames)  # [K, C, FRAME]

    # analysis windows: [prev frame, this frame]
    prev = jnp.concatenate([state.analysis_mem[None], xf[:-1]], axis=0)
    bufs = jnp.concatenate([prev, xf], axis=-1)  # [K, C, WINDOW]
    Xr, Xi = _forward_transform(bufs.reshape(K * C, WINDOW_SIZE))
    Ex = _band_energy(Xr, Xi).reshape(K, C, NB_BANDS)
    Xr = Xr.reshape(K, C, FREQ_SIZE)
    Xi = Xi.reshape(K, C, FREQ_SIZE)

    # pitch windows: sliding PITCH_BUF_SIZE windows over the running signal
    flat = jnp.concatenate(
        [state.pitch_buf, jnp.moveaxis(xf, 0, 1).reshape(C, K * FRAME_SIZE)],
        axis=-1)
    win = jax.vmap(lambda t: jax.lax.dynamic_slice_in_dim(
        flat, (t + 1) * FRAME_SIZE, PITCH_BUF_SIZE, axis=-1))(jnp.arange(K))
    period, pitch_gain = _pitch_search(win.reshape(K * C, PITCH_BUF_SIZE))
    period = period.reshape(K, C)
    pitch_gain = pitch_gain.reshape(K, C)
    pitch_buf_out = flat[:, -PITCH_BUF_SIZE:]

    E = jnp.sum(Ex - 1e-2, axis=-1)
    silence = E < 1e-1  # [K, C]

    log_e = jnp.log10(Ex)
    ceps = log_e @ _DCT.T  # [K, C, 22]
    # chronological prior history: P[j] = hist[:, (idx+j) % 8], oldest first
    idx = state.ceps_idx
    order = (idx + jnp.arange(CEPS_MEM)) % CEPS_MEM
    prior = jnp.moveaxis(jnp.take(state.cepstral_hist, order, axis=1), 1, 0)
    full = jnp.concatenate([prior, ceps], axis=0)  # [8+K, C, 22]
    prev1 = full[CEPS_MEM - 1:CEPS_MEM - 1 + K]  # ceps[t-1]
    prev2 = full[CEPS_MEM - 2:CEPS_MEM - 2 + K]  # ceps[t-2]
    d1 = ceps[..., :NB_DELTA_CEPS] - prev2[..., :NB_DELTA_CEPS]
    d2 = (ceps[..., :NB_DELTA_CEPS] - 2 * prev1[..., :NB_DELTA_CEPS]
          + prev2[..., :NB_DELTA_CEPS])
    # history window at frame t = full[t+1 : t+9]; variance is order-invariant
    hist_wins = jax.vmap(lambda t: jax.lax.dynamic_slice_in_dim(
        full, t + 1, CEPS_MEM, axis=0))(jnp.arange(K))  # [K, 8, C, 22]
    spec_var = jnp.var(hist_wins, axis=1).mean(axis=-1, keepdims=True)
    pitch_ceps = pitch_gain[..., None] * ceps[..., :NB_DELTA_CEPS]
    features = jnp.concatenate(
        [ceps, d1, d2, pitch_ceps,
         (period[..., None].astype(jnp.float32) / 256.0 - 1.5), spec_var],
        axis=-1)  # [K, C, 42]

    # store the last 8 ceps back in rotated-slot format
    new_idx = (idx + K) % CEPS_MEM
    last8 = full[-CEPS_MEM:]  # oldest..newest
    positions = (idx + K + jnp.arange(CEPS_MEM)) % CEPS_MEM
    hist_out = jnp.zeros_like(state.cepstral_hist)
    hist_out = hist_out.at[:, positions].set(jnp.moveaxis(last8, 0, 1))

    new_state = DenoiseState(
        analysis_mem=xf[-1],
        synthesis_mem=state.synthesis_mem,
        pitch_buf=pitch_buf_out,
        cepstral_hist=hist_out,
        ceps_idx=new_idx,
        hp_mem=hp_mem,
        rnn=state.rnn,
    )
    return new_state, features, Ex, Xr, Xi, silence


def denoise_frames_fast(state: DenoiseState, weights: dict, frames):
    """Fast-path peer of denoise_frames_scan: batched front end + GRU-only
    scan + batched synthesis.  frames [K, C, FRAME] ->
    (state', outs [K, C, FRAME], vads [K, C])."""
    K, C, _ = frames.shape
    state, features, Ex, Xr, Xi, silence = analysis_frames_batch(state, frames)

    def gru_step(rnn, xs):
        feats, sil = xs
        new_rnn, gains, vad = rnn_frame(rnn, weights, feats)
        keep = sil[:, None]
        rnn = RnnState(
            vad_h=jnp.where(keep, rnn.vad_h, new_rnn.vad_h),
            noise_h=jnp.where(keep, rnn.noise_h, new_rnn.noise_h),
            denoise_h=jnp.where(keep, rnn.denoise_h, new_rnn.denoise_h),
        )
        return rnn, (gains, jnp.where(sil, 0.0, vad))

    rnn, (gains, vads) = jax.lax.scan(gru_step, state.rnn, (features, silence))

    gain_bins = _interp_band_gain(gains.reshape(K * C, NB_BANDS)).reshape(
        K, C, FREQ_SIZE)
    sil = silence[..., None]
    Xor = jnp.where(sil, Xr, Xr * gain_bins)
    Xoi = jnp.where(sil, Xi, Xi * gain_bins)
    y = _inverse_transform(
        Xor.reshape(K * C, FREQ_SIZE), Xoi.reshape(K * C, FREQ_SIZE)
    ).reshape(K, C, WINDOW_SIZE)
    tails = jnp.concatenate(
        [state.synthesis_mem[None], y[:-1, :, FRAME_SIZE:]], axis=0)
    outs = y[:, :, :FRAME_SIZE] + tails
    new_state = state._replace(synthesis_mem=y[-1, :, FRAME_SIZE:], rnn=rnn)
    return new_state, outs, vads


denoise_frames_fast_jit = jax.jit(denoise_frames_fast)


DEFAULT_WEIGHTS_PATH = __file__.rsplit("/", 2)[0] + "/data/rnnoise_weights.npz"


def default_weights() -> dict:
    """Packaged weights trained in-repo (models/rnnoise_train.py) if present,
    else the deterministic random init (architecture-exact, inert)."""
    import os

    if os.path.exists(DEFAULT_WEIGHTS_PATH):
        return load_weights(DEFAULT_WEIGHTS_PATH)
    return random_weights(0)


__all__ = [
    "FRAME_SIZE",
    "DenoiseState",
    "RnnState",
    "analysis_frame",
    "analysis_frames_scan",
    "rnn_frame",
    "denoise_frame",
    "denoise_frames_scan",
    "denoise_frames_scan_jit",
    "analysis_frames_batch",
    "denoise_frames_fast",
    "denoise_frames_fast_jit",
    "denoise_init",
    "default_weights",
    "load_weights",
    "random_weights",
    "DEFAULT_WEIGHTS_PATH",
    "WEIGHT_KEYS",
]
