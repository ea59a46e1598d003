"""BT.601 studio-swing YUV <-> RGB conversion kernels (4:2:0 planar).

videoconvert's colorspace step — the bridge between the RGB-domain
elements (hsv, colorlut, compositor, analytics) and the I420-domain codec
elements (rav1enc, dav1ddec, ffv1).  The reference leans on GStreamer's
video-converter for this (the yoloxinference example pipeline runs
`videoconvertscale` between decoder and inference —
analytics/burn/src/yoloxinference/imp.rs docs); here it is a fused XLA
program per geometry.

TPU shape discipline (PERF_NOTES small-channel rule): all arithmetic runs
on [H, W] single-component planes — full-width rows tile cleanly onto
(8, 128) vregs — never on [H, W, 3] arrays whose 3-deep minor dim pads
to 128 lanes.  Chroma down-sampling is a reshape-mean; up-sampling is the
broadcast-reshape 2x nearest (bit-equal to jax.image nearest, without its
gather lowering).  The packed-pixel slice/stack at the RGB boundary is
the format itself and happens once per conversion.

Matrices: ITU-R BT.601 with studio swing (Y 16..235, C 16..240), the
GStreamer default for SD video: Y' = 16 + 219*(Kr*R + Kg*G + Kb*B)/255,
Cb = 128 + 224/255 * (B - Y)/(2*(1-Kb)), Kr=.299 Kb=.114.  Values are
rounded-to-nearest then clamped to [0, 255] (full-range clamp like
GStreamer's integer paths, which keeps the transform invertible at the
edges rather than clipping to studio range).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

KR, KG, KB = 0.299, 0.587, 0.114


def _round_u8(x):
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


def _subsample(p):
    """[H, W] -> [H/2, W/2] by 2x2 mean (the video-converter default)."""
    h, w = p.shape
    return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _upsample(p):
    """[H/2, W/2] -> [H, W] nearest via broadcast-reshape (no gathers)."""
    h2, w2 = p.shape
    return jnp.broadcast_to(p[:, None, :, None], (h2, 2, w2, 2)).reshape(h2 * 2, w2 * 2)


def rgb_planes_to_i420(r, g, b):
    """Three u8/f32 [H, W] planes -> (y [H,W], u, v [H/2,W/2]) u8.

    Trace-level building block (jit the caller): the element slices the
    planes out of whatever packed order its caps carry."""
    r = r.astype(jnp.float32)
    g = g.astype(jnp.float32)
    b = b.astype(jnp.float32)
    ey = KR * r + KG * g + KB * b                     # 0..255 luma
    y = 16.0 + ey * (219.0 / 255.0)
    # chroma from the subsampled difference signal (linear, so subsampling
    # before or after the matrix is identical — one reshape-mean each)
    cb = 128.0 + _subsample(b - ey) * (224.0 / 255.0 / (2.0 * (1.0 - KB)))
    cr = 128.0 + _subsample(r - ey) * (224.0 / 255.0 / (2.0 * (1.0 - KR)))
    return _round_u8(y), _round_u8(cb), _round_u8(cr)


def i420_to_rgb_planes(y, u, v):
    """(y, u, v) u8 planes -> three u8 [H, W] planes (r, g, b)."""
    yf = (y.astype(jnp.float32) - 16.0) * (255.0 / 219.0)
    cb = _upsample(u.astype(jnp.float32) - 128.0) * (255.0 / 224.0)
    cr = _upsample(v.astype(jnp.float32) - 128.0) * (255.0 / 224.0)
    r = yf + cr * (2.0 * (1.0 - KR))
    b = yf + cb * (2.0 * (1.0 - KB))
    g = (yf - KR * r - KB * b) * (1.0 / KG)
    return _round_u8(r), _round_u8(g), _round_u8(b)


@jax.jit
def rgb_to_i420(rgb):
    """[H, W, >=3] u8 packed R,G,B[,A] -> (y, u, v) u8 planes."""
    return rgb_planes_to_i420(rgb[..., 0], rgb[..., 1], rgb[..., 2])


@jax.jit
def i420_to_rgb(y, u, v):
    """(y, u, v) u8 planes -> [H, W, 3] u8 packed RGB."""
    return jnp.stack(i420_to_rgb_planes(y, u, v), axis=-1)


@jax.jit
def uv_to_nv12(u, v):
    """Two [H/2, W/2] chroma planes -> one interleaved [H/2, W] NV12 plane."""
    h2, w2 = u.shape
    return jnp.stack([u, v], axis=-1).reshape(h2, w2 * 2)


@jax.jit
def nv12_to_uv(uv):
    """Interleaved [H/2, W] NV12 chroma -> two [H/2, W/2] planes."""
    h2, w = uv.shape
    d = uv.reshape(h2, w // 2, 2)
    return d[..., 0], d[..., 1]


__all__ = ["rgb_planes_to_i420", "i420_to_rgb_planes", "rgb_to_i420",
           "i420_to_rgb", "uv_to_nv12", "nv12_to_uv", "KR", "KG", "KB"]
