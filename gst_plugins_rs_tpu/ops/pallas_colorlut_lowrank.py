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


__all__ = ["lowrank_sample_pallas", "pack_factors",
           "lut3d_apply_lowrank_fused", "SB", "TPL"]
