"""Delay-line echo kernel (rsaudioecho compute path).

Reference behavior (audio/audiofx/src/audioecho/imp.rs:69-85 +
ring_buffer.rs:59-76): per interleaved sample, with delay line w and lag d:

    delayed = w[n - d]            (zeros before stream start; lag S when d == 0,
                                   S = ring size = max_delay samples)
    out[n]  = in[n] + intensity * delayed
    w[n]    = in[n] + feedback  * delayed

TPU-native design: the scalar ring walk becomes a *history tail* of the last S
written samples plus chunked vector processing.  Within a chunk of size
<= lag there is no intra-chunk dependency, so each chunk is pure
gather/FMA on the VPU; chunks advance via lax.scan.  Chunk layout is static
per (buffer size, lag) so XLA compiles one program per caps signature.
Works batched over a leading stream axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _process_chunks(x, hist, intensity, feedback, lag: int):
    """x: [n_chunks, chunk] flat interleaved samples; hist: [S]."""
    S = hist.shape[-1]
    chunk = x.shape[-1]

    def step(h, xc):
        delayed = jax.lax.dynamic_slice_in_dim(h, S - lag, chunk)
        out = xc + intensity * delayed
        wr = xc + feedback * delayed
        h = jnp.concatenate([h[chunk:], wr]) if chunk < S else wr[-S:]
        return h, out

    hist, out = jax.lax.scan(step, hist, x)
    return out, hist


@partial(jax.jit, static_argnames=("lag",))
def echo_apply_flat(x, hist, intensity, feedback, *, lag: int):
    """Apply echo to a flat interleaved sample vector.

    x: [N] samples; hist: [S] history (S >= lag >= 1).
    Returns (out [N], new_hist [S]).
    """
    N = x.shape[0]
    S = hist.shape[0]
    assert 1 <= lag <= S, (lag, S)
    chunk = min(lag, N)
    n_full = N // chunk
    rem = N - n_full * chunk
    out_parts = []
    if n_full:
        o, hist = _process_chunks(
            x[: n_full * chunk].reshape(n_full, chunk), hist, intensity, feedback, lag
        )
        out_parts.append(o.reshape(-1))
    if rem:
        o, hist = _process_chunks(x[n_full * chunk :].reshape(1, rem), hist, intensity, feedback, lag)
        out_parts.append(o.reshape(-1))
    out = out_parts[0] if len(out_parts) == 1 else jnp.concatenate(out_parts)
    return out, hist


@partial(jax.jit, static_argnames=("lag",))
def echo_apply_batched(x, hist, intensity, feedback, *, lag: int):
    """Batched over streams: x [B, N], hist [B, S], intensity/feedback [B]."""
    return jax.vmap(lambda xi, hi, ii, fi: echo_apply_flat(xi, hi, ii, fi, lag=lag))(
        x, hist, intensity, feedback
    )


def echo_lag_samples(delay_ns: int, max_delay_ns: int, rate: int, channels: int) -> int:
    """Reference lag formula (imp.rs:74-77, delay clamped to max-delay):
    floor(min(delay, max_delay) * channels * rate / 1e9) interleaved samples."""
    d = min(delay_ns, max_delay_ns)
    return (d * channels * rate) // 1_000_000_000


def echo_ring_size(max_delay_ns: int, rate: int, channels: int) -> int:
    """Reference ring size (imp.rs:248-259): floor(max_delay*rate/1e9)*channels."""
    return ((max_delay_ns * rate) // 1_000_000_000) * channels


__all__ = ["echo_apply_flat", "echo_apply_batched", "echo_lag_samples", "echo_ring_size"]
