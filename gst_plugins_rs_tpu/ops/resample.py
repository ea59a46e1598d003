"""Rational audio resampling as one XLA dilated convolution.

audioresample — the GStreamer-core element every cross-rate reference
pipeline assumes (audioloudnorm is fixed at 192 kHz —
audio/audiofx/src/audioloudnorm/imp.rs:207-214 — while audiornnoise is
fixed at 48 kHz, so chaining them REQUIRES a rate converter).

TPU-first form: for a reduced ratio L/M the textbook polyphase resampler
is exactly `conv_general_dilated(x, h, lhs_dilation=L, stride=M)` — the
zero-stuffed upsample, anti-alias FIR, and decimation fuse into a single
XLA convolution that lowers onto the MXU; no per-output-sample loop, no
gathers.  Sub-sample output phase folds into the conv as negative low
padding.  The prototype lowpass is a Kaiser-windowed sinc with each
polyphase leg normalized to unit DC gain (constants survive exactly) and
linear phase (delay compensated in the output indexing).

Streaming: `Resampler` carries FIR history and the output counter across
buffers — chunked processing is sample-identical to one-shot (pinned by
tests/test_audioresample.py).

Math. Upsampled grid: input x[i] sits at position i*L.  Output n reads
the window starting at s_n = n*M - D (D = (T-1)//2, the linear-phase
delay): y[n] = sum_k h[k] * x_up[s_n + k].  A strided dilated conv over a
buffer whose first sample is input index b computes exactly these sums
for s_n >= b*L; the offset (s_n - b*L) splits as q*L + r with the whole
samples q dropped from the buffer head and the remainder r becoming
negative low padding.
"""
from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def design_filter(L: int, M: int, taps_per_phase: int = 24,
                  beta: float = 8.6) -> np.ndarray:
    """Kaiser-windowed sinc prototype at the upsampled rate, length
    taps_per_phase*L (odd), cutoff pi/max(L, M), polyphase legs
    DC-normalized."""
    T = taps_per_phase * L + 1  # odd -> integer group delay (T-1)/2
    n = np.arange(T, dtype=np.float64) - (T - 1) / 2.0
    cutoff = 1.0 / max(L, M)  # fraction of the upsampled Nyquist
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(T, beta)
    for p in range(L):
        leg = h[p::L]
        s = leg.sum()
        if abs(s) > 1e-12:
            h[p::L] = leg / s
    return h.astype(np.float32)


@partial(jax.jit, static_argnames=("L", "M", "n_out"))
def _resample_block(x, h_pad, L: int, M: int, n_out: int):
    """x: [n_in, ch] f32 -> [n_out, ch] f32.  h_pad is the prototype
    delayed by the sub-sample phase r (a [T+L] DATA argument — the phase
    cycles block to block without recompiling; only n_out's +-1 wobble
    and the block length are static)."""
    Tp = h_pad.shape[0]
    lhs = x.T[:, None, :]                      # [ch, 1, n_in]
    # XLA convs are correlations (no kernel flip) — exactly the sum we want
    rhs = h_pad[None, None, :]                 # [1, 1, T+L]
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(M,),
        padding=[(0, Tp + M)],
        lhs_dilation=(L,),
    )
    return out[:, 0, :n_out].T


class Resampler:
    """Streaming rational resampler for [n, ch] f32 interleaved blocks."""

    def __init__(self, rate_in: int, rate_out: int, taps_per_phase: int = 24):
        g = math.gcd(rate_in, rate_out)
        self.L = rate_out // g
        self.M = rate_in // g
        self.identity = self.L == self.M
        h = design_filter(self.L, self.M, taps_per_phase)
        self.T = int(h.shape[0])
        self.delay = (self.T - 1) // 2
        # row r = prototype delayed by r upsampled taps (phase-as-data:
        # selecting a row swaps VALUES, not shapes, so the cycling output
        # phase never recompiles the conv)
        table = np.zeros((self.L, self.T + self.L), np.float32)
        for r in range(self.L):
            table[r, r : r + self.T] = h
        self._h_table = jnp.asarray(table)
        self._hist = None    # input samples [i0, total_in)
        self._i0 = 0         # input index of _hist[0] (may start negative)
        self._total_in = 0   # real input samples consumed
        self._produced = 0   # outputs emitted

    def reset(self) -> None:
        self._hist = None
        self._i0 = 0
        self._total_in = 0
        self._produced = 0

    def process(self, x) -> jnp.ndarray:
        """[n, ch] f32 in -> [m, ch] f32 out (m varies block to block)."""
        x = jnp.asarray(x, jnp.float32)
        if self.identity:
            return x
        if self._hist is None:
            # virtual zeros covering the filter's look-back before t=0
            self._i0 = (-self.delay) // self.L  # floor division (negative)
            self._hist = jnp.zeros((-self._i0, x.shape[1]), jnp.float32)
        buf = jnp.concatenate([self._hist, x], axis=0)
        total_in = self._total_in + int(x.shape[0])
        # emit every n whose window [s_n, s_n+T) has all inputs available:
        # s_n + T <= total_in * L, with s_n = n*M - D
        n_max = (total_in * self.L - self.T + self.delay) // self.M
        n_out = int(n_max - self._produced + 1)
        if n_out > 0:
            s0 = self._produced * self.M - self.delay
            # buf[0] sits AT the output frontier (retention below), so the
            # remaining offset is the sub-sample phase r in [0, L) — except
            # after a clamped drain, where whole samples q are trimmed
            q, r = divmod(s0 - self._i0 * self.L, self.L)
            assert q >= 0, (s0, self._i0)
            y = _resample_block(buf[q:] if q else buf,
                                self._h_table[int(r)],
                                self.L, self.M, n_out)
            self._produced += n_out
        else:
            y = jnp.zeros((0, x.shape[1]), jnp.float32)
        self._total_in = total_in
        # retain from the NEXT output's window start (floor to whole input)
        s_next = self._produced * self.M - self.delay
        i0_new = min(s_next // self.L, total_in)
        self._hist = buf[i0_new - self._i0:]
        self._i0 = i0_new
        return y

    def drain(self) -> jnp.ndarray:
        """Flush the filter tail with silence (≈ delay/M outputs)."""
        if self.identity or self._hist is None:
            return jnp.zeros((0, 1), jnp.float32)
        ch = self._hist.shape[1]
        flush = (self.T + self.M) // self.L + 2
        return self.process(jnp.zeros((flush, ch), jnp.float32))


__all__ = ["Resampler", "design_filter"]
