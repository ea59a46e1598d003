"""agingradio distortion-chain kernel.

Reference: audio/audiofx/src/agingradio/imp.rs:94-133 — per 2-frame chunk a
random click (whole chunk = 1.0, bypassing the filter chain and its state);
otherwise per sample: add uniform white noise, clamp to [-1,1], first-order
lowpass (RC single-pole, per channel), quantize to 2^bits steps, N passes of
cubic distortion x -= d*x^3.

TPU-native: the per-sample lowpass recurrence runs as a first-order
associative scan with per-sample coefficients (clicked samples become
identity steps so the filter state skips them exactly like the reference);
everything else is fused elementwise VPU work.  RNG is an explicit jax PRNG
key (deterministic, unlike the reference's thread RNG — imp.rs:99).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lowpass_alpha(rate: int, freq: float) -> float:
    """Single-pole RC alpha: dt/(RC+dt), RC = 1/(2*pi*fc)."""
    import math

    dt = 1.0 / rate
    rc = 1.0 / (2.0 * math.pi * freq)
    return dt / (rc + dt)


def _first_order_scan(x, a, b, y0):
    """y[n] = a[n]*y[n-1] + b[n]*x[n] via associative scan.  x,a,b: [N, ch]."""

    def combine(l, r):
        la, lb = l
        ra, rb = r
        return ra * la, ra * lb + rb

    ca, cb = jax.lax.associative_scan(combine, (a, b * x), axis=0)
    return ca * y0 + cb


@partial(jax.jit, static_argnames=("passes", "use_lowpass"))
def agingradio_process(
    x,
    key,
    filt_state,
    noise_ampl,
    clicks_prob,
    alpha,
    bits,
    distortion,
    *,
    passes: int,
    use_lowpass: bool,
):
    """x: [N, ch]; filt_state: [ch] lowpass memory.  Returns (out, filt_state')."""
    dtype = x.dtype
    N, ch = x.shape
    k1, k2 = jax.random.split(key)

    # one click decision per 2-frame chunk (imp.rs:101-104)
    n_chunks = (N + 1) // 2
    clicks = jax.random.uniform(k1, (n_chunks,), dtype) < clicks_prob
    click_mask = jnp.repeat(clicks, 2)[:N][:, None]  # [N, 1]

    noise = jax.random.uniform(k2, (N, ch), dtype, minval=-1.0, maxval=1.0) * noise_ampl
    y = x + noise

    if use_lowpass:
        y = jnp.clip(y, -1.0, 1.0)
        # clicked samples are identity steps for the filter state
        a = jnp.where(click_mask, 1.0, 1.0 - alpha) * jnp.ones((N, ch), dtype)
        b = jnp.where(click_mask, 0.0, alpha) * jnp.ones((N, ch), dtype)
        y = _first_order_scan(y, a, b, filt_state[None, :])
        # filter state after the last non-click step is simply y[-1] when the
        # last step is a filter step; with identity steps it carries through
        new_state = y[-1]
    else:
        new_state = filt_state

    factor = 2.0**bits
    y = jnp.where(bits > 0, jnp.round(y * factor) / factor, y)
    for _ in range(passes):
        y = jnp.where(distortion > 0, y - distortion * y**3, y)

    out = jnp.where(click_mask, jnp.asarray(1.0, dtype), y)
    return out, new_state


__all__ = ["agingradio_process", "lowpass_alpha"]
