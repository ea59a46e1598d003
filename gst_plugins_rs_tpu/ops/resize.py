"""Separable image resizing as MXU matmuls — the videoscale kernel.

The reference ecosystem scales with GStreamer's videoconvertscale (the
yoloxinference docs pipeline runs one before inference —
analytics/burn/src/yoloxinference/imp.rs); burn itself resizes on-accel.

TPU-first design: per-pixel resampling is a gather on most backends, but
XLA gathers issue ~1 row/5 cycles on v5e (the measured colorlut/jax.image
ceiling in PERF_NOTES.md).  Bilinear (and nearest) resampling is
SEPARABLE: out = A_h @ img @ A_w^T with interpolation matrices A_h
[H2, H1], A_w [W2, W1] built host-side at negotiation time.  Dense
matmuls land on the MXU at full rate — a 1080p->720p 3-channel resize is
~7 GFLOP against a ~200 TFLOP/s unit, three orders of magnitude under
the gather path's ceiling.  Nearest matrices are one-hot, so the matmul
form is bit-identical to the gather form.

Weight convention: half-pixel centers (src = (i + 0.5) * in/out - 0.5),
edges clamped — matching jax.image.resize / GStreamer's default sampling.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def resize_matrix(n_out: int, n_in: int, method: str = "bilinear") -> np.ndarray:
    """[n_out, n_in] f32 row-stochastic interpolation matrix."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    if method == "nearest":
        idx = np.clip(np.floor(src + 0.5).astype(np.int64), 0, n_in - 1)
        m[np.arange(n_out), idx] = 1.0
    elif method == "bilinear":
        lo = np.floor(src).astype(np.int64)
        frac = (src - lo).astype(np.float32)
        lo_c = np.clip(lo, 0, n_in - 1)
        hi_c = np.clip(lo + 1, 0, n_in - 1)
        rows = np.arange(n_out)
        np.add.at(m, (rows, lo_c), 1.0 - frac)
        np.add.at(m, (rows, hi_c), frac)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return m


def resize_plane(img, ah, aw):
    """[H1, W1] (any real dtype) -> [H2, W2] f32 via two matmuls."""
    x = img.astype(jnp.float32)
    return ah @ x @ aw.T


def resize_u8(img, ah, aw):
    """[H1, W1] or [H1, W1, C] u8 -> resized u8, rounded half-up."""
    if img.ndim == 2:
        y = resize_plane(img, ah, aw)
        return jnp.clip(jnp.round(y), 0.0, 255.0).astype(jnp.uint8)
    # channels-last: matmul each channel plane (C is tiny; the [H,W]
    # planes are the lane-friendly shapes — PERF_NOTES small-channel rule)
    outs = [jnp.clip(jnp.round(resize_plane(img[..., c], ah, aw)), 0.0, 255.0)
            for c in range(img.shape[-1])]
    return jnp.stack(outs, axis=-1).astype(jnp.uint8)


def make_resizer(h_in: int, w_in: int, h_out: int, w_out: int,
                 method: str = "bilinear"):
    """jitted [H1,W1,(C)] u8 -> [H2,W2,(C)] u8 closure for one geometry."""
    ah = jnp.asarray(resize_matrix(h_out, h_in, method))
    aw = jnp.asarray(resize_matrix(w_out, w_in, method))
    return jax.jit(lambda img: resize_u8(img, ah, aw))


__all__ = ["resize_matrix", "resize_plane", "resize_u8", "make_resizer"]
