"""Real FFT as (re, im) pairs with an MXU matmul implementation.

The axon TPU relay in this environment rejects XLA FFT ops and complex
dtypes ("Unimplemented"), so every spectral kernel (hrtfrender / sofalizer
block convolution, RNNoise analysis/synthesis) routes through this module:

- When the default backend supports FFT (CPU tests), jnp.fft is used and
  split into (re, im).
- Otherwise the DFT is evaluated as TWO real matmuls against precomputed
  cosine/sine matrices — for the frame sizes used here (<= 4096) this is the
  MXU-friendly formulation anyway (a [B, n] x [n, n/2+1] matmul instead of a
  bandwidth-bound butterfly).

All arrays stay real; complex multiplication is explicit on pairs.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


# Probed once, eagerly at import (probing lazily inside a jit trace would
# evaluate the try/except against tracer machinery and mis-detect).
def _probe_fft() -> bool:
    try:
        x = jnp.fft.rfft(jnp.ones(8, jnp.float32))
        np.asarray(jnp.sum(jnp.abs(x)))
        return True
    except Exception:  # noqa: BLE001 - backend capability probe
        return False


_FFT_SUPPORTED = _probe_fft()


def fft_supported() -> bool:
    return _FFT_SUPPORTED


@lru_cache(maxsize=32)
def _dft_mats(n: int):
    k = n // 2 + 1
    j = np.arange(n)[:, None]
    kk = np.arange(k)[None, :]
    ang = 2.0 * np.pi * j * kk / n
    cos = np.cos(ang).astype(np.float32)  # [n, k]
    msin = (-np.sin(ang)).astype(np.float32)
    # inverse: x_j = (1/n) * (re_0 + 2*sum_{0<k<n/2} (re cos + im... ) + re_{n/2} cosn)
    w = np.full(k, 2.0, np.float64)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    icos = (np.cos(ang) * w[None, :] / n).T.astype(np.float32)  # [k, n]
    isin = (-np.sin(ang) * w[None, :] / n).T.astype(np.float32)  # [k, n]
    # cached as NUMPY (converting to device arrays inside a trace would leak
    # tracers through the lru_cache); jnp.asarray at use is a free constant
    return cos, msin, icos, isin


def rfft_pair(x, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [..., m] (zero-padded to n) -> (re, im) each [..., n//2+1]."""
    m = x.shape[-1]
    if m < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - m)]
        x = jnp.pad(x, pad)
    elif m > n:
        x = x[..., :n]
    if fft_supported():
        X = jnp.fft.rfft(x, n, axis=-1)
        return jnp.real(X), jnp.imag(X)
    cos, msin, _, _ = _dft_mats(n)
    re = jnp.matmul(x, jnp.asarray(cos), precision=_HIGHEST)
    im = jnp.matmul(x, jnp.asarray(msin), precision=_HIGHEST)
    return re, im


def irfft_pair(re, im, n: int) -> jnp.ndarray:
    """(re, im) [..., n//2+1] -> x [..., n]."""
    if fft_supported():
        X = re + 1j * im
        return jnp.fft.irfft(X, n, axis=-1)
    _, _, icos, isin = _dft_mats(n)
    # x_j = sum_k w_k/n (re_k cos - im_k sin); isin already carries the -sin
    return jnp.matmul(re, jnp.asarray(icos), precision=_HIGHEST) + jnp.matmul(
        im, jnp.asarray(isin), precision=_HIGHEST
    )


def cmul_pair(ar, ai, br, bi):
    """(ar+i*ai) * (br+i*bi) -> (re, im)."""
    return ar * br - ai * bi, ar * bi + ai * br


__all__ = ["rfft_pair", "irfft_pair", "cmul_pair", "fft_supported"]
