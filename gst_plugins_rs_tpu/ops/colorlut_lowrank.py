"""Low-rank separable 3D-LUT sampling: gather-free colorlut on the MXU.

Reference math: video/colorlut/src/colorlut/imp.rs:493-526 (trilinear
8-corner interpolation).  Every previously measured TPU path for that math
is gather-rate-bound at ~100-140 fps/1080p on v5e (PERF_NOTES.md "colorlut
gather analysis"): XLA gather issues ~1 row / 5 cycles and tetrahedral /
packing / one-hot-Pallas variants don't change the gather count or lose to
Mosaic codegen.

This module removes the gather entirely.  Decompose the LUT tensor
T[z,y,x,c] (size S^3 x 3) by CP/PARAFAC:

    T[z,y,x,c] ~= sum_k  W[z,k] * V[y,k] * U[x,k] * C[c,k]

Trilinear interpolation is multilinear in each axis, so sampling the
reconstruction at continuous (x,y,z) factorizes EXACTLY:

    out(x,y,z)[c] = sum_k (hat(x)@U)_k (hat(y)@V)_k (hat(z)@W)_k C[c,k]

where hat(x) is the [S]-vector of linear-interpolation hat weights (two
nonzeros).  Per frame that is three [P,S]@[S,K] matmuls + one [P,K]@[K,3]
— pure MXU work, zero gathers.  Because hat weights are non-negative and
sum to 1, the interpolated error is a convex combination of node errors:

    max_{continuous xyz} |exact - lowrank| = max_{grid nodes} |T - T_hat|

so validating the fit on the S^3 grid nodes bounds the error everywhere.
The fit (ALS, numpy, at LUT-load time) escalates rank until the node-space
max error clears the caller's tolerance.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CpLut:
    """CP factors of a 3D LUT; axis factors indexed grid-node x rank."""

    U: np.ndarray  # [S, K] x-axis (R input component)
    V: np.ndarray  # [S, K] y-axis (G)
    W: np.ndarray  # [S, K] z-axis (B)
    C: np.ndarray  # [3, K] output-channel mixing
    max_node_err: float  # max |T - reconstruction| over all S^3 nodes


def _reconstruct(W, V, U, C):
    """Dense T[z,y,x,c] from factors in (axis0=z, axis1=y, axis2=x, chan)
    order — the same order cp_als returns."""
    return np.einsum("zk,yk,xk,ck->zyxc", W, V, U, C)


def _khatri_rao(mats):
    out = mats[0]
    for m in mats[1:]:
        out = (out[:, None, :] * m[None, :, :]).reshape(-1, out.shape[1])
    return out


def cp_als(
    t: np.ndarray,
    rank: int,
    iters: int = 60,
    seed: int = 0,
    tol: float = 1e-12,
    init: Optional[Tuple[np.ndarray, ...]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Alternating least squares CP fit of t [S,S,S,3] at the given rank.

    Standard 4-way ALS with khatri-rao products; f64 throughout.  The
    tensor is tiny (33^3*3 ~ 108k values), so each sweep runs in
    milliseconds.  `init` warm-starts from smaller-rank factors: existing
    columns are kept and the remaining columns are random — this is how
    fit_lowrank escalates rank without refitting from scratch.
    """
    rng = np.random.default_rng(seed)
    s = t.shape[0]
    t = t.astype(np.float64)
    mats = []
    for dim in (s, s, s, 3):
        m = rng.standard_normal((dim, rank)) * 0.3
        mats.append(m)
    if init is not None:
        for m, w in zip(mats, init):
            k = min(rank, w.shape[1])
            m[:, :k] = w[:, :k]

    # mode-n unfoldings of t with axis order (z, y, x, c)
    unfolds = [
        np.moveaxis(t, i, 0).reshape(t.shape[i], -1) for i in range(4)
    ]
    prev_err = np.inf
    for _ in range(iters):
        for n in range(4):
            others = [mats[i] for i in range(4) if i != n]
            kr = _khatri_rao(others)
            gram = np.ones((rank, rank))
            for m in others:
                gram *= m.T @ m
            sol = np.linalg.lstsq(gram, (unfolds[n] @ kr).T, rcond=None)[0]
            mats[n] = sol.T
        rec = _reconstruct(*mats)
        err = float(np.abs(rec - t).max())
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return tuple(mats)  # type: ignore[return-value]


def fit_lowrank(
    table: np.ndarray,
    size: int,
    tolerance: float,
    max_rank: int = 128,
    start_rank: int = 16,
) -> Optional[CpLut]:
    """Fit CP factors for a flat [S^3, 3] .cube table until the max node
    error <= tolerance (in the LUT's output units, typically [0,1] where a
    u8 LSB is 1/255).  Escalates rank with warm-started ALS (new columns
    fit the residual of the previous rank).  Returns None if max_rank
    doesn't reach the tolerance."""
    t = table.reshape(size, size, size, 3).astype(np.float64)
    best: Optional[CpLut] = None
    rank = min(start_rank, max_rank)
    prev: Optional[Tuple[np.ndarray, ...]] = None
    while True:
        mats = cp_als(t, rank, iters=40 if prev is None else 30,
                      init=prev)
        err = float(np.abs(_reconstruct(*mats) - t).max())
        W, V, U, C = mats
        if best is None or err < best.max_node_err:
            best = CpLut(
                U=U.astype(np.float32), V=V.astype(np.float32),
                W=W.astype(np.float32), C=C.astype(np.float32),
                max_node_err=err)
        if err <= tolerance:
            return best
        if rank >= max_rank or rank * 2 >= size * size:
            return None
        prev = mats
        rank = min(rank * 2, max_rank)


def _hat_weights(x, size: int, dtype):
    """[..., S] linear-interpolation hat weights for continuous index x in
    [0, S-1]: w_i = max(0, 1 - |x - i|).  Two nonzeros per row; exactly the
    reference's (1-t, t) lerp pair."""
    grid = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - grid))
    return w.astype(dtype)


def _norm(v, scale, offset, size):
    return jnp.clip(v * scale + offset, 0.0, 1.0) * (size - 1.0)


@partial(jax.jit, static_argnames=("size", "offsets", "bits", "compute_dtype"))
def lut3d_apply_lowrank(
    frame,
    U, V, W, C,
    scale, offset,
    *,
    size: int,
    offsets: Tuple[int, int, int],
    bits: int,
    compute_dtype: str = "bfloat16",
):
    """Gather-free 3D LUT grade via CP factors (see module docstring).

    frame: [..., C] uint8/uint16; U/V/W [S,K], C [3,K].  Matmuls run in
    `compute_dtype` with f32 accumulation; quantization/round matches
    lut3d_apply (imp.rs:494-534 order up to the documented approximation
    tolerance)."""
    maxval = float(2**bits - 1)
    dtype = frame.dtype
    cdt = jnp.dtype(compute_dtype)

    r = frame[..., offsets[0]].astype(jnp.float32) / maxval
    g = frame[..., offsets[1]].astype(jnp.float32) / maxval
    b = frame[..., offsets[2]].astype(jnp.float32) / maxval
    x = _norm(r, scale[0], offset[0], size)
    y = _norm(g, scale[1], offset[1], size)
    z = _norm(b, scale[2], offset[2], size)

    f32 = jnp.float32
    mm = partial(jax.lax.dot_general,
                 dimension_numbers=(((1,), (0,)), ((), ())),
                 preferred_element_type=f32)
    shp = x.shape
    ax = _hat_weights(x.reshape(-1), size, cdt)
    ay = _hat_weights(y.reshape(-1), size, cdt)
    az = _hat_weights(z.reshape(-1), size, cdt)
    u = mm(ax, U.astype(cdt))  # [P, K] f32 accum
    v = mm(ay, V.astype(cdt))
    w = mm(az, W.astype(cdt))
    prod = (u * v * w).astype(cdt)
    cc = mm(prod, C.T.astype(cdt))  # [P, 3]
    cc = cc.reshape(shp + (3,))

    out = frame
    for comp, off in enumerate(offsets):
        q = jnp.round(jnp.clip(cc[..., comp], 0.0, 1.0) * maxval).astype(dtype)
        out = out.at[..., off].set(q)
    return out


__all__ = ["CpLut", "cp_als", "fit_lowrank", "lut3d_apply_lowrank"]
