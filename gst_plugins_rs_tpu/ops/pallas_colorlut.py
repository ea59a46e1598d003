"""Pallas MXU kernel for the 3D-LUT color grade (colorlut fast path).

Why: XLA gathers issue ~1 row / 5 cycles on this TPU regardless of row
width (PERF_NOTES.md), capping the exact packed-corner-gather path at
~100-140 fps for 1080p 33^3 grades — 2 M pixels = 2 M gather rows.  The
MXU has no such limit, so this kernel reformulates trilinear sampling as
a dense matmul:

    out(p) = sum_{y,z} [wy_y(p) * wz_z(p)] * T2[y*S+z, :]

where wy/wz are per-axis hat functions (2 nonzeros each, built on the
VPU from broadcasted iota — no gather) and T2 packs, per (y,z) pair, the
33 x-entries of all 3 channels.  A [P, S^2] one-hot-ish weight matrix
per tile contracts against the [S^2, 3S] table entirely in VMEM; the
x-axis interpolation is a second hat-weighted lane reduction.  All
gather units idle; the MXU does ~150 MFLOP per 512-pixel tile.

Precision: weights and table run bf16 (8-bit mantissa) with f32
accumulation — measured <=1 u8 LSB vs the exact f32 gather path (the
same tolerance class as hsvdetector's documented <=1 LSB).  The exact
gather path (ops/colorlut.lut3d_apply_packed) remains the default;
elements opt in via precision=fast.

Only sizes with 3*size <= 128 lanes (size <= 42, covering the common
17/33 grades) use this kernel; larger LUTs fall back to the gather path.

Reference math: video/colorlut/src/colorlut/imp.rs:493-526 (trilinear
with x1 = min(x0+1, size-1) clamping — the hat formulation reproduces
the clamped weights exactly at the boundaries).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 512


def pack_matmul_table(table: np.ndarray, size: int) -> np.ndarray:
    """[size^3, 3] flat LUT ([x + y*s + z*s^2] order) -> [YZPAD, 128] f32
    with T2[y*s + z, c*s + i] = table value of channel c at (i, y, z)."""
    if 3 * size > 128:
        raise ValueError(f"MXU colorlut kernel supports size <= 42, got {size}")
    yz = size * size
    yzpad = ((yz + 127) // 128) * 128
    t = table.reshape(size, size, size, 3)  # [z, y, x, c]
    t2 = np.zeros((yzpad, 128), np.float32)
    for c in range(3):
        # rows j = y*size + z; lanes c*size + i
        block = np.transpose(t[:, :, :, c], (1, 0, 2)).reshape(yz, size)  # [y*z, x]
        t2[:yz, c * size:(c + 1) * size] = block
    return t2


def _lut_kernel(size_ref, x_ref, y_ref, z_ref, t2_ref, r_ref, g_ref, b_ref):
    size = size_ref[0]
    fsize = size.astype(jnp.float32)
    yzpad = t2_ref.shape[0]
    yp = y_ref[:]  # [P, 1] positions in [0, size-1]
    zp = z_ref[:]
    jj = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, yzpad), 1)
    jy = (jj // size).astype(jnp.float32)
    jz = jj.astype(jnp.float32) - jy * fsize
    # hat functions: exactly the trilinear corner weights, including the
    # x1=min(x0+1,size-1) boundary behavior (weight 0 beyond the edge)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yp - jy))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(zp - jz))
    w = (wy * wz).astype(jnp.bfloat16)
    out1 = jnp.dot(w, t2_ref[:], preferred_element_type=jnp.float32)  # [P, 128]
    xp = x_ref[:]
    kk = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, 128), 1)
    kc = (kk // size).astype(jnp.float32)
    ki = kk.astype(jnp.float32) - kc * fsize
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xp - ki))
    prod = out1 * wx
    r_ref[:] = jnp.sum(jnp.where(kc == 0.0, prod, 0.0), axis=1, keepdims=True)
    g_ref[:] = jnp.sum(jnp.where(kc == 1.0, prod, 0.0), axis=1, keepdims=True)
    b_ref[:] = jnp.sum(jnp.where(kc == 2.0, prod, 0.0), axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("size", "interpret"))
def _lut3d_positions_mxu(xpos, ypos, zpos, t2_bf16, *, size: int,
                         interpret: bool = False):
    """positions: [P] f32 in [0, size-1]; returns (r, g, b) [P] f32 in 0..1."""
    p = xpos.shape[0]
    grid = (pl.cdiv(p, TILE_P),)
    pos_spec = pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t2_spec = pl.BlockSpec(t2_bf16.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((p, 1), jnp.float32)
    r, g, b = pl.pallas_call(
        _lut_kernel,
        grid=grid,
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # size
            pos_spec, pos_spec, pos_spec,
            t2_spec,
        ],
        out_specs=(pos_spec, pos_spec, pos_spec),
        interpret=interpret,
    )(jnp.asarray([size], jnp.int32), xpos[:, None], ypos[:, None],
      zpos[:, None], t2_bf16)
    return r[:, 0], g[:, 0], b[:, 0]


@partial(jax.jit, static_argnames=("size", "offsets", "bits", "interpret"))
def lut3d_apply_mxu(frame, t2_bf16, scale, offset, *, size: int,
                    offsets=(0, 1, 2), bits: int = 8,
                    interpret: bool = False):
    """Drop-in fast-path peer of ops/colorlut.lut3d_apply_packed.

    frame [..., C] uint; t2_bf16 from pack_matmul_table (cast to bf16).
    """
    maxval = float(2 ** bits - 1)
    dtype = frame.dtype
    shape = frame.shape[:-1]
    p = int(np.prod(shape))

    def pos(comp, off):
        v = frame[..., off].astype(jnp.float32) / maxval
        return (jnp.clip(v * scale[comp] + offset[comp], 0.0, 1.0)
                * (size - 1.0)).reshape(p)

    r, g, b = _lut3d_positions_mxu(
        pos(0, offsets[0]), pos(1, offsets[1]), pos(2, offsets[2]),
        t2_bf16, size=size, interpret=interpret)
    out = frame
    for comp, off, cc in ((0, offsets[0], r), (1, offsets[1], g), (2, offsets[2], b)):
        q = jnp.round(jnp.clip(cc.reshape(shape), 0.0, 1.0) * maxval).astype(dtype)
        out = out.at[..., off].set(q)
    return out


__all__ = ["TILE_P", "pack_matmul_table", "lut3d_apply_mxu"]
