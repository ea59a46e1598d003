"""Fused Pallas kernel for the low-rank (CP) colorlut path.

The XLA form of ops/colorlut_lowrank.py is HBM-traffic-bound: the [P,S]
hat-weight matrices and [P,K] axis projections materialize between ops
(~4.6 GB per 1080p frame at rank 64 — measured, PERF_NOTES.md).  This
kernel keeps the whole per-pixel chain in VMEM:

    layout: pixels on the LANE axis, basis/rank on the SUBLANE axis.
    A_x = hat(x)  [SB, TPL]   built from broadcasted_iota (two nonzeros/col)
    u   = U^T @ A_x  [K, TPL]  (MXU; same for y/z)
    out_c = sum_sublane(u * v * w * C[c][:, None])  [3, TPL]  (VPU)

Traffic per frame: read xyz [3,P] f32 + write rgb [3,P] f32 ~ 50 MB vs
4.6 GB — the kernel is MXU-compute-bound instead.

Mosaic constraints honored (see ops/pallas_hsv.py and the axon notes):
no u8<->f32 casts in-kernel (wrapper pre/post-casts in XLA), iota via
broadcasted_iota, f32 iota avoided (int32 iota + astype).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# basis rows padded so both f32 (8) and bf16 (16) sublane tiles fit; hat
# weights for rows >= S are exactly 0 whenever x <= S-1, so no mask needed
SB = 48
# pixels per tile (lane axis), multiple of 128.  Measured on v5e (rank 64,
# 1080p batch 8): 1024 -> 995 fps, 2048 -> 1161, 4096 -> 1208, 8192 -> 1230
# (bare kernel); 4096 keeps VMEM use ~6 MB with headroom for rank 128.
TPL = 4096


def _kernel(xyz_ref, ut_ref, vt_ref, wt_ref, c_ref, out_ref, *, compute_dtype):
    cdt = jnp.dtype(compute_dtype)
    # hat weights on the sublane axis: A[i, p] = max(0, 1 - |x_p - i|)
    rows = jax.lax.broadcasted_iota(jnp.int32, (SB, TPL), 0).astype(jnp.float32)

    def hats(row):
        x = xyz_ref[row, :][None, :]  # [1, TPL]
        return jnp.maximum(0.0, 1.0 - jnp.abs(x - rows)).astype(cdt)

    mm = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    u = mm(ut_ref[:].astype(cdt), hats(0))  # [K, TPL]
    v = mm(vt_ref[:].astype(cdt), hats(1))
    w = mm(wt_ref[:].astype(cdt), hats(2))
    prod = u * v * w  # [K, TPL] f32
    c = c_ref[:]  # [3(padded 8), K]
    for ch in range(3):
        out_ref[ch, :] = jnp.sum(prod * c[ch, :][:, None], axis=0)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def lowrank_sample_pallas(xyz, ut, vt, wt, c, *, compute_dtype="bfloat16",
                          interpret: bool = False):
    """xyz [3, P] f32 continuous grid coords in [0, S-1]; ut/vt/wt [K, SB]
    transposed axis factors (rows >= S zero); c [8, K] channel factors
    (rows >= 3 zero).  Returns [3, P] f32 interpolated LUT outputs.
    P must be a multiple of TPL (wrapper pads)."""
    _, p = xyz.shape
    k = ut.shape[0]
    grid = (p // TPL,)
    return pl.pallas_call(
        partial(_kernel, compute_dtype=compute_dtype),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((3, p), jnp.float32),
        in_specs=[
            pl.BlockSpec((3, TPL), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, TPL), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xyz, ut, vt, wt, c)


def pack_factors(U, V, W, C, pad_rank_to: int = 16):
    """CP factors [S,K]x3 + [3,K] -> kernel layout: ut/vt/wt [Kp, SB] f32
    (transposed, zero-padded) and c [8, Kp]."""
    s, k = U.shape
    kp = -(-k // pad_rank_to) * pad_rank_to
    assert s <= SB, f"LUT size {s} exceeds kernel basis capacity {SB}"

    def t(m):
        out = np.zeros((kp, SB), np.float32)
        out[:k, :s] = m.T
        return out

    c = np.zeros((8, kp), np.float32)
    c[:3, :k] = C
    return t(U), t(V), t(W), c


@partial(jax.jit, static_argnames=("size", "offsets", "bits", "compute_dtype",
                                  "interpret"))
def lut3d_apply_lowrank_fused(frame, ut, vt, wt, c, scale, offset, *,
                              size: int, offsets, bits: int,
                              compute_dtype: str = "bfloat16",
                              interpret: bool = False):
    """Drop-in peer of colorlut_lowrank.lut3d_apply_lowrank running the
    inner chain through the fused Pallas kernel.  frame [..., C] uint."""
    maxval = float(2**bits - 1)
    dtype = frame.dtype
    shp = frame.shape[:-1]

    def norm(v, comp):
        v = v.astype(jnp.float32) / maxval
        return jnp.clip(v * scale[comp] + offset[comp], 0.0, 1.0) * (size - 1.0)

    x = norm(frame[..., offsets[0]], 0).reshape(-1)
    y = norm(frame[..., offsets[1]], 1).reshape(-1)
    z = norm(frame[..., offsets[2]], 2).reshape(-1)
    p = x.shape[0]
    pp = -(-p // TPL) * TPL
    xyz = jnp.stack([x, y, z])
    if pp != p:
        xyz = jnp.pad(xyz, ((0, 0), (0, pp - p)))
    cc = lowrank_sample_pallas(xyz, ut, vt, wt, c,
                               compute_dtype=compute_dtype,
                               interpret=interpret)  # [3, pp]
    q = jnp.round(jnp.clip(cc[:, :p], 0.0, 1.0) * maxval).astype(dtype)
    # reassemble channels by position in ONE stack (three .at[].set scatters
    # each re-materialize the whole frame — measured ~2x kernel cost)
    nch = frame.shape[-1]
    chans = []
    for ch in range(nch):
        if ch in offsets:
            chans.append(q[offsets.index(ch)].reshape(shp))
        else:
            chans.append(frame[..., ch])
    return jnp.stack(chans, axis=-1)


# ---------------------------------------------------------------------------
# fully-packed variant: u32 RGBA pixels in, u32 RGBA pixels out.
# The f32 wrapper traffic (xyz [3,P] + out [3,P] + channel restack,
# ~950 MB/batch-8) still cost ~30% on top of the bare kernel; packing the
# whole pixel through the kernel cuts io to 2 x 66 MB.  Integer unpack/
# repack (shifts/masks) runs on the VPU; the alpha byte rides through.

ROWS = 8  # sublane rows per block (u32 tile granularity)


def _packed_kernel(params_ref, px_ref, ut_ref, vt_ref, wt_ref, c_ref,
                   out_ref, *, size, compute_dtype):
    cdt = jnp.dtype(compute_dtype)
    f32 = jnp.float32
    iota_rows = jax.lax.broadcasted_iota(
        jnp.int32, (SB, TPL), 0).astype(f32)
    mm = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    maxval = params_ref[6]
    i32 = lambda n: jnp.int32(n)  # literals stay int32 under jax_enable_x64
    m255 = i32(255)
    for row in range(ROWS):
        px = px_ref[row, :]  # [TPL] int32 bit pattern
        r = jnp.bitwise_and(px, m255).astype(f32)
        g = jnp.bitwise_and(jax.lax.shift_right_logical(px, i32(8)), m255).astype(f32)
        b = jnp.bitwise_and(jax.lax.shift_right_logical(px, i32(16)), m255).astype(f32)
        a = jnp.bitwise_and(jax.lax.shift_right_logical(px, i32(24)), m255)

        def norm(v, comp):
            vv = v / maxval
            vv = jnp.clip(vv * params_ref[comp] + params_ref[3 + comp],
                          0.0, 1.0)
            return vv * (size - 1.0)

        def hats(x):
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(x[None, :] - iota_rows)).astype(cdt)

        u = mm(ut_ref[:].astype(cdt), hats(norm(r, 0)))
        v = mm(vt_ref[:].astype(cdt), hats(norm(g, 1)))
        w = mm(wt_ref[:].astype(cdt), hats(norm(b, 2)))
        prod = u * v * w  # [K, TPL]
        c = c_ref[:]
        outs = []
        for ch in range(3):
            y = jnp.sum(prod * c[ch, :][:, None], axis=0)
            outs.append(jnp.round(
                jnp.clip(y, 0.0, 1.0) * maxval).astype(jnp.int32))
        packed = (outs[0]
                  | jax.lax.shift_left(outs[1], i32(8))
                  | jax.lax.shift_left(outs[2], i32(16))
                  | jax.lax.shift_left(a, i32(24)))
        out_ref[row, :] = packed


@partial(jax.jit, static_argnames=("size", "compute_dtype", "interpret"))
def lowrank_sample_pallas_packed(px, params, ut, vt, wt, c, *, size: int,
                                 compute_dtype="bfloat16",
                                 interpret: bool = False):
    """px [Pr, TPL] int32 RGBA bit patterns; params [8] f32 =
    (scale0..2, offset0..2, maxval, 0).  Returns [Pr, TPL] int32."""
    pr = px.shape[0]
    k = ut.shape[0]
    grid = (pr // ROWS,)
    return pl.pallas_call(
        partial(_packed_kernel, size=size, compute_dtype=compute_dtype),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((pr, TPL), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec((ROWS, TPL), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SB), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, TPL), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, px, ut, vt, wt, c)


@partial(jax.jit, static_argnames=("size", "offsets", "bits", "compute_dtype",
                                  "interpret"))
def lut3d_apply_lowrank_packed(frame, ut, vt, wt, c, scale, offset, *,
                               size: int, offsets, bits: int,
                               compute_dtype: str = "bfloat16",
                               interpret: bool = False):
    """Fully-fused path for RGBA u8 frames (offsets (0,1,2), bits 8): the
    frame is bitcast to u32 pixels and the whole unpack/sample/repack runs
    in one kernel.  Falls back is the caller's job for other layouts."""
    assert bits == 8 and tuple(offsets) == (0, 1, 2) and frame.shape[-1] == 4
    shp = frame.shape
    px = jax.lax.bitcast_convert_type(
        frame.reshape(-1, 4), jnp.int32).reshape(-1)  # little-endian RGBA
    p = px.shape[0]
    blk = ROWS * TPL
    pp = -(-p // blk) * blk
    if pp != p:
        px = jnp.pad(px, (0, pp - p))
    params = jnp.asarray(
        [scale[0], scale[1], scale[2], offset[0], offset[1], offset[2],
         float(2**bits - 1), 0.0], jnp.float32)
    out = lowrank_sample_pallas_packed(
        px.reshape(-1, TPL), params, ut, vt, wt, c, size=size,
        compute_dtype=compute_dtype, interpret=interpret)
    out = out.reshape(-1)[:p]
    return jax.lax.bitcast_convert_type(
        out.reshape(-1, 1), jnp.uint8).reshape(shp)


__all__ = ["lowrank_sample_pallas", "lowrank_sample_pallas_packed",
           "pack_factors", "lut3d_apply_lowrank_fused",
           "lut3d_apply_lowrank_packed", "ROWS", "SB", "TPL"]
