"""Pallas TPU kernel for the hsvfilter core (f32 planar form).

The production hsvfilter path is the XLA kernel in ops/hsv.py (sextant-unit
rewrite, ~8600 fps/chip at 1080p).  This module carries the same math as a
hand-written Pallas kernel over planar f32 channels, for two reasons:

- it is the template for fusing *chains* of per-pixel effects into one VMEM
  round trip (PERF_NOTES.md: keep frames planar f32 across chained
  elements; XLA re-materializes between separately-jitted elements), and
- it documents what Mosaic accepts on this relay (no u8<->f32 casts inside
  kernels — hence the f32-planar contract; see the axon gotchas notes).

`hsv_filter_pallas(r, g, b, params)` takes [H, W] f32 planes in [0, 1] and
returns adjusted planes.  Measured on the chip it is within noise of the
fused XLA version for the single-effect case (both VPU-compute-bound), so
ops/hsv.py stays the element's default; benchmarks in
tests/test_pallas_hsv.py assert numerical equivalence instead.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 512  # multiple of the 128-lane width


def _hsv_kernel(params_ref, r_ref, g_ref, b_ref, ro_ref, go_ref, bo_ref):
    r = r_ref[:]
    g = g_ref[:]
    b = b_ref[:]
    shift_sextant = params_ref[0] * (1.0 / 60.0)
    sat_mul, sat_off = params_ref[1], params_ref[2]
    val_mul, val_off = params_ref[3], params_ref[4]

    value = jnp.maximum(jnp.maximum(r, g), b)
    minv = jnp.minimum(jnp.minimum(r, g), b)
    chroma = value - minv
    inv_c = 1.0 / jnp.where(chroma == 0.0, 1.0, chroma)
    eps = 1e-5
    is_r = jnp.abs(value - r) < eps
    is_g = jnp.abs(value - g) < eps
    is_b = jnp.abs(value - b) < eps
    num = jnp.where(is_r, g - b, jnp.where(is_g, b - r, jnp.where(is_b, r - g, 0.0)))
    base = jnp.where(is_r, 0.0, jnp.where(is_g, 2.0, jnp.where(is_b, 4.0, 0.0)))
    hp = jnp.where(chroma == 0.0, 0.0, base + num * inv_c) + shift_sextant
    hp = jnp.where(hp < 0.0, hp + 6.0, hp)
    hp = jnp.where(hp >= 6.0, hp - 6.0, hp)

    sat = chroma * (1.0 / jnp.where(value == 0.0, 1.0, value))
    sat = jnp.where(value == 0.0, 0.0, sat)
    s = jnp.clip(sat_mul * sat + sat_off, 0.0, 1.0)
    v = jnp.clip(val_mul * value + val_off, 0.0, 1.0)

    c = v * s
    x = c * (1.0 - jnp.abs(hp - 2.0 * jnp.floor(hp * 0.5) - 1.0))
    zero = jnp.zeros_like(c)

    def sel(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            hp <= 1.0, c0,
            jnp.where(hp <= 2.0, c1,
                      jnp.where(hp <= 3.0, c2,
                                jnp.where(hp <= 4.0, c3,
                                          jnp.where(hp <= 5.0, c4, c5)))))

    m = v - c
    ro_ref[:] = sel(c, x, zero, zero, x, c) + m
    go_ref[:] = sel(x, c, c, x, zero, zero) + m
    bo_ref[:] = sel(zero, zero, x, c, c, x) + m


@partial(jax.jit, static_argnames=("interpret",))
def hsv_filter_pallas(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                      params: jnp.ndarray, *, interpret: bool = False):
    """[H, W] f32 planes in [0,1] -> adjusted (r, g, b) planes.

    params: [hue_shift_deg (pre-reduced mod 360), sat_mul, sat_off,
    val_mul, val_off] f32.  interpret=True runs the kernel in the Pallas
    interpreter (CI runs on CPU where Mosaic is unavailable)."""
    h, w = r.shape
    grid = (pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W))
    plane = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    shapes = jax.ShapeDtypeStruct(r.shape, r.dtype)
    return pl.pallas_call(
        _hsv_kernel,
        grid=grid,
        out_shape=(shapes, shapes, shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            plane, plane, plane,
        ],
        out_specs=(plane, plane, plane),
        interpret=interpret,
    )(params, r, g, b)


__all__ = ["hsv_filter_pallas"]
