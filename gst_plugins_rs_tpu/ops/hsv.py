"""HSV conversion / filter / detect kernels (video/hsv compute path).

Reference math: video/hsv/src/hsvutils.rs:40-198 (RGB<->HSV with EPSILON
sextant selection, wiki HSL_and_HSV formulation) and the per-pixel loops in
hsvfilter/imp.rs:76-120 and hsvdetector/imp.rs:100-160.

TPU-native design: the per-pixel scalar loops become fused element-wise VPU
programs over whole frames [..., H, W, C] (any leading batch dims).  The u8
quantization (`as u8` truncation for the filter path) is preserved so outputs
bit-match the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-5


def rgb_to_hsv(r, g, b):
    """r,g,b: f32 in [0,1] -> (h in [0,360), s, v in [0,1]).

    Mirrors hsvutils::from_rgb including the EPSILON-based sextant chain
    evaluated in r,g,b order."""
    value = jnp.maximum(jnp.maximum(r, g), b)
    minv = jnp.minimum(jnp.minimum(r, g), b)
    chroma = value - minv
    # one reciprocal instead of three divisions (VPU-compute-bound kernel);
    # numerator selected by the same EPSILON sextant chain as the reference
    inv_c = 1.0 / jnp.where(chroma == 0.0, 1.0, chroma)
    num = jnp.where(
        jnp.abs(value - r) < EPSILON,
        g - b,
        jnp.where(
            jnp.abs(value - g) < EPSILON,
            b - r,
            jnp.where(jnp.abs(value - b) < EPSILON, r - g, 0.0),
        ),
    )
    base = jnp.where(
        jnp.abs(value - r) < EPSILON,
        0.0,
        jnp.where(
            jnp.abs(value - g) < EPSILON,
            2.0,
            jnp.where(jnp.abs(value - b) < EPSILON, 4.0, 0.0),
        ),
    )
    hue = jnp.where(chroma == 0.0, 0.0, 60.0 * (base + num * inv_c))
    hue = jnp.where(hue < 0.0, hue + 360.0, hue)
    hue = jnp.mod(hue, 360.0)
    sat = chroma * (1.0 / jnp.where(value == 0.0, 1.0, value))
    sat = jnp.where(value == 0.0, 0.0, sat)
    return hue, jnp.clip(sat, 0.0, 1.0), jnp.clip(value, 0.0, 1.0)


def hsv_to_rgb(h, s, v):
    """Inverse of rgb_to_hsv; mirrors hsvutils::to_rgb sextant logic
    (boundaries with <=, zero outside [0,6])."""
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    zero = jnp.zeros_like(c)

    def sel(c0, c1, c2, c3, c4, c5):
        # piecewise over sextants; hp<0 or hp>6 -> 0
        return jnp.where(
            hp < 0.0,
            zero,
            jnp.where(
                hp <= 1.0,
                c0,
                jnp.where(
                    hp <= 2.0,
                    c1,
                    jnp.where(hp <= 3.0, c2, jnp.where(hp <= 4.0, c3, jnp.where(hp <= 5.0, c4, jnp.where(hp <= 6.0, c5, zero)))),
                ),
            ),
        )

    rp = sel(c, x, zero, zero, x, c)
    gp = sel(x, c, c, x, zero, zero)
    bp = sel(zero, zero, x, c, c, x)
    m = v - c
    return rp + m, gp + m, bp + m


def _split_rgb(frame, offsets: Tuple[int, int, int]):
    r = frame[..., offsets[0]].astype(jnp.float32) / 255.0
    g = frame[..., offsets[1]].astype(jnp.float32) / 255.0
    b = frame[..., offsets[2]].astype(jnp.float32) / 255.0
    return r, g, b


@partial(jax.jit, static_argnames=("offsets",))
def hsv_filter_frame(frame, params, *, offsets: Tuple[int, int, int]):
    """Apply hue-shift / sat / value transform in place.

    frame: [..., C] uint8; params: [5] f32 (hue_shift, sat_mul, sat_off,
    val_mul, val_off); offsets: (r,g,b) channel positions.
    Returns a frame of identical shape/dtype (non-RGB channels preserved).

    VPU-optimized form: hue never leaves *sextant units* (h/60).  The
    reference's degrees round trip (x60, mod 360, +shift, mod 360, /60)
    collapses to one add and two conditional subtracts, since
    base+num/chroma is in (-1, 5] and shift/60 in [0, 6).  This kernel is
    compute-bound (PERF_NOTES.md), so removing the two mods and two
    scalings is a direct throughput win; outputs stay within the
    documented <=1 u8 LSB of the strict-order reference math."""
    r, g, b = _split_rgb(frame, offsets)
    value = jnp.maximum(jnp.maximum(r, g), b)
    minv = jnp.minimum(jnp.minimum(r, g), b)
    chroma = value - minv
    inv_c = 1.0 / jnp.where(chroma == 0.0, 1.0, chroma)
    is_r = jnp.abs(value - r) < EPSILON
    is_g = jnp.abs(value - g) < EPSILON
    is_b = jnp.abs(value - b) < EPSILON
    num = jnp.where(is_r, g - b, jnp.where(is_g, b - r, jnp.where(is_b, r - g, 0.0)))
    base = jnp.where(is_r, 0.0, jnp.where(is_g, 2.0, jnp.where(is_b, 4.0, 0.0)))
    hp = jnp.where(chroma == 0.0, 0.0, base + num * inv_c)  # (-1, 5]
    hp = hp + params[0] * (1.0 / 60.0)  # shift already reduced mod 360 host-side
    hp = jnp.where(hp < 0.0, hp + 6.0, hp)
    hp = jnp.where(hp >= 6.0, hp - 6.0, hp)

    sat = chroma * (1.0 / jnp.where(value == 0.0, 1.0, value))
    sat = jnp.where(value == 0.0, 0.0, sat)
    s = jnp.clip(params[1] * sat + params[2], 0.0, 1.0)
    v = jnp.clip(params[3] * value + params[4], 0.0, 1.0)

    c = v * s
    x = c * (1.0 - jnp.abs(hp - 2.0 * jnp.floor(hp * 0.5) - 1.0))
    zero = jnp.zeros_like(c)

    def sel(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            hp <= 1.0,
            c0,
            jnp.where(
                hp <= 2.0,
                c1,
                jnp.where(hp <= 3.0, c2,
                          jnp.where(hp <= 4.0, c3, jnp.where(hp <= 5.0, c4, c5))),
            ),
        )

    m = v - c
    r2 = sel(c, x, zero, zero, x, c) + m
    g2 = sel(x, c, c, x, zero, zero) + m
    b2 = sel(zero, zero, x, c, c, x) + m
    out = frame
    # reference quantization: clamp then `as u8` truncation
    # (hsvutils::to_rgb).  Exact u8 values at truncation boundaries are
    # FP-op-order dependent (the reference's own identity round-trip is not
    # u8-exact); XLA reassociation can differ by <=1 LSB there.
    for off, comp in zip(offsets, (r2, g2, b2)):
        q = jnp.clip(comp * 255.0, 0.0, 255.0).astype(jnp.uint8)
        out = out.at[..., off].set(q)
    return out


@partial(jax.jit, static_argnames=("in_offsets", "out_offsets", "out_channels", "alpha_off"))
def hsv_detect_frame(
    frame,
    params,
    *,
    in_offsets: Tuple[int, int, int],
    out_offsets: Tuple[int, int, int],
    out_channels: int,
    alpha_off: int,
):
    """Chroma-key detect: copy RGB, set alpha=255 inside the HSV window else 0.

    params: [6] f32 (hue_ref, hue_var, sat_ref, sat_var, val_ref, val_var).
    Output dtype uint8, shape [..., out_channels]."""
    r, g, b = _split_rgb(frame, in_offsets)
    h, s, v = rgb_to_hsv(r, g, b)
    # circular hue distance via shift-to-180 (hsvdetector/imp.rs:141-149)
    shifted = h + (180.0 - params[0])
    shifted = jnp.where(shifted < 0.0, shifted + 360.0, shifted)
    shifted = jnp.mod(shifted, 360.0)
    inside = (
        (jnp.abs(shifted - 180.0) <= params[1])
        & (jnp.abs(s - params[2]) <= params[3])
        & (jnp.abs(v - params[4]) <= params[5])
    )
    alpha = jnp.where(inside, jnp.uint8(255), jnp.uint8(0))
    out_shape = frame.shape[:-1] + (out_channels,)
    out = jnp.zeros(out_shape, jnp.uint8)
    for i_off, o_off in zip(in_offsets, out_offsets):
        out = out.at[..., o_off].set(frame[..., i_off])
    out = out.at[..., alpha_off].set(alpha)
    return out


__all__ = ["rgb_to_hsv", "hsv_to_rgb", "hsv_filter_frame", "hsv_detect_frame", "EPSILON"]
