"""ITU-T G.711 A-law / mu-law companding as vectorized device ops.

The reference payloads already-companded audio (audio/x-alaw / audio/x-mulaw
caps, net/rtp/src/pcmau/pay/imp.rs:37-59) and leaves the companding itself to
GStreamer's alawenc/mulawenc.  Here the companders are part of the framework
(elements/net/codecs.py) and run on device: branch-free jnp.where forms of
the classic Sun Microsystems g711.c segment search, bit-exact vs CPython's
`audioop` implementation of the same tables (tests/test_rtp.py oracle).

Companding is elementwise u16->u8 — trivially VPU-friendly and fusable into
adjacent kernels; the interesting part is keeping it integer-exact.
"""
from __future__ import annotations

import jax.numpy as jnp

_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_BIAS = 0x84  # mu-law bias (Sun g711.c)
_UCLIP = 8159


def _segment(val, ends) -> jnp.ndarray:
    """Index of the first segment end >= val (8 if none) — the seg_end search
    from g711.c, done as a sum of comparisons (branch-free)."""
    seg = jnp.zeros(val.shape, jnp.int32)
    for e in ends:
        seg = seg + (val > e).astype(jnp.int32)
    return seg


def alaw_encode(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16 linear PCM -> u8 A-law."""
    x = pcm.astype(jnp.int32) >> 3  # 13-bit magnitude domain
    neg = x < 0
    mask = jnp.where(neg, 0x55, 0xD5)
    x = jnp.where(neg, -x - 1, x)
    seg = _segment(x, _SEG_AEND)
    shift = jnp.where(seg < 2, 1, seg)
    aval = (jnp.minimum(seg, 7) << 4) | ((x >> shift) & 0xF)
    out = jnp.where(seg >= 8, 0x7F, aval) ^ mask
    return out.astype(jnp.uint8)


def alaw_decode(alaw: jnp.ndarray) -> jnp.ndarray:
    """u8 A-law -> int16 linear PCM."""
    a = alaw.astype(jnp.int32) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = jnp.where(seg == 0, t + 8, (t + 0x108) << jnp.maximum(seg - 1, 0))
    return jnp.where(a & 0x80, t, -t).astype(jnp.int16)


def mulaw_encode(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16 linear PCM -> u8 mu-law."""
    x = pcm.astype(jnp.int32) >> 2  # 14-bit domain
    neg = x < 0
    mask = jnp.where(neg, 0x7F, 0xFF)
    x = jnp.minimum(jnp.where(neg, -x, x), _UCLIP) + (_BIAS >> 2)
    seg = _segment(x, _SEG_UEND)
    uval = (jnp.minimum(seg, 7) << 4) | ((x >> (seg + 1)) & 0xF)
    out = jnp.where(seg >= 8, 0x7F, uval) ^ mask
    return out.astype(jnp.uint8)


def mulaw_decode(mulaw: jnp.ndarray) -> jnp.ndarray:
    """u8 mu-law -> int16 linear PCM."""
    u = (~mulaw.astype(jnp.int32)) & 0xFF
    t = (((u & 0xF) << 3) + _BIAS) << ((u & 0x70) >> 4)
    return jnp.where(u & 0x80, _BIAS - t, t - _BIAS).astype(jnp.int16)


__all__ = ["alaw_encode", "alaw_decode", "mulaw_encode", "mulaw_decode"]
