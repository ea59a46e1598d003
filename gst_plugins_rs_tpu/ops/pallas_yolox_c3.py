"""Fused Pallas kernel for YOLOX's dark2 C3 (CspBottleneck) stage.

The s2d engine (models/yolox_fast.py) runs stem+dark2 in the
space-to-depth domain; round-4 profiling isolated ~0.21 ms/frame of the
whole model to inter-conv HBM round trips INSIDE this C3: XLA
materializes every one of its 5..8 convs' activations at [H/8, W/8, 4*C]
between dispatches (PERF_NOTES.md "YOLOX round 4").  This kernel holds
the whole residual chain in VMEM per image:

    x1 = silu(y @ W1 + b1)             # 1x1 (s2d block-diagonal)
    x2 = silu(y @ W2 + b2)             # 1x1
    n x bottleneck:
        t  = silu(x1 @ Wa_i + ba_i)    # 1x1
        t  = silu(conv3x3(t, Wb_i) + bb_i)
        x1 = x1 + t                    # shortcut (non-SPP C3 always)
    out = silu([x1 ++ x2] @ W3 + b3)   # 1x1 over the concat

TPU mapping (see /opt/skills/guides/pallas_guide.md):

- Spatial is FLATTENED to [P = H*W, C]: every 1x1 conv is then a plain
  MXU matmul, and the 3x3 conv becomes 9 tap-matmuls over row-shifted
  views of a zero-padded [P + 2(W+1), C] VMEM scratch — tap (du, dv)
  reads rows [(W+1) + du*W + dv : .. + P].  Row over/underflow lands in
  the zero pad; column wrap (w + dv outside [0, W)) is masked with a
  per-dv [P, 1] predicate.  No gathers, no reshapes inside the kernel.
- Grid is (batch,) with auto-pipelined [P, C4] VMEM blocks per image.
  (A manual-DMA form with inputs in ANY/HBM crashes this relay's Mosaic
  remote compiler — examples/_c3_pallas_bisect.py isolates
  make_async_copy+grid as the killer construct; every compute construct
  of this kernel compiles fine.)  The output block doubles as the
  scratch for conv3's x2 half (acc3 = x2 @ W3[Ch:]) before the final
  result overwrites it.
- All matmuls accumulate in f32 (preferred_element_type); activations
  are stored in `dtype` (f32 for engine=fast, bf16 for fast-bf16).

Parity: the chain is the exact block rewrite of
/root/reference/analytics/burn/src/yolox_burn/model/darknet.rs:19-135
(CSPDarknet's dark2 C3) in the s2d domain; numerics are gated against
the XLA `_c3_s2d` path in tests/test_yolox_c3_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(P, W, C4, Ch, n, dtype):
    f32 = jnp.float32
    PAD = W + 1  # the (-1,-1) tap reads from row (center - W - 1)

    def kernel(y_ref, W1, b1, W2, b2, Wa, ba, Wb, bb, W3, b3, o_ref,
               x1buf, tpad):
        # zero the halo rows (the center is rewritten every bottleneck;
        # the borders stay zero throughout)
        tpad[0:PAD, :] = jnp.zeros((PAD, Ch), dtype)
        tpad[PAD + P:, :] = jnp.zeros((PAD, Ch), dtype)

        y = y_ref[0]
        x1buf[:] = jax.nn.silu(
            jnp.dot(y, W1[:], preferred_element_type=f32) + b1[:]
        ).astype(dtype)
        x2 = jax.nn.silu(
            jnp.dot(y, W2[:], preferred_element_type=f32) + b2[:]
        ).astype(dtype)
        # conv3's x2 half, staged in the output block (y/x2 die here)
        o_ref[0] = jnp.dot(
            x2, W3[Ch:, :], preferred_element_type=f32).astype(dtype)

        wcol = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
        col_mask = {-1: wcol >= 1, 0: None, 1: wcol <= W - 2}

        for i in range(n):
            t = jax.nn.silu(
                jnp.dot(x1buf[:], Wa[i], preferred_element_type=f32)
                + ba[i]
            ).astype(dtype)
            tpad[PAD:PAD + P, :] = t
            acc = jnp.zeros((P, Ch), f32)
            for tap in range(9):
                du, dv = tap // 3 - 1, tap % 3 - 1
                off = PAD + du * W + dv
                xs = tpad[off:off + P, :]
                m = col_mask[dv]
                if m is not None:
                    xs = jnp.where(m, xs, jnp.zeros_like(xs))
                acc = acc + jnp.dot(xs, Wb[i * 9 + tap],
                                    preferred_element_type=f32)
            x1buf[:] = (x1buf[:].astype(f32)
                        + jax.nn.silu(acc + bb[i])).astype(dtype)

        o_ref[0] = jax.nn.silu(
            jnp.dot(x1buf[:], W3[:Ch, :], preferred_element_type=f32)
            + o_ref[0].astype(f32) + b3[:]
        ).astype(dtype)

    return kernel


@partial(jax.jit, static_argnames=("width", "n", "interpret"))
def c3_s2d_fused(y, W1, b1, W2, b2, Wa, ba, Wb, bb, W3, b3,
                 *, width: int, n: int, interpret: bool = False):
    """Fused C3 over an s2d-domain activation.

    y: [B, H, W, C4] (C4 = 4 * normal-domain channels), any float dtype;
    weights are the FOLDED (BN-absorbed) s2d-domain matrices:
      W1, W2: [C4, Ch]   b1, b2: [1, Ch]
      Wa: [n, Ch, Ch]    ba: [n, 1, Ch]
      Wb: [n*9, Ch, Ch]  bb: [n, 1, Ch]   (9 taps, row-major (du, dv))
      W3: [2*Ch, C4]     b3: [1, C4]      (rows [:Ch] = x1, [Ch:] = x2)
    Returns [B, H, W, C4] in y.dtype.
    """
    B, H, Wd, C4 = y.shape
    assert Wd == width
    P = H * Wd
    Ch = W1.shape[1]
    dtype = y.dtype
    yflat = y.reshape(B, P, C4)

    kernel = _make_kernel(P, Wd, C4, Ch, n, dtype)
    img_spec = pl.BlockSpec((1, P, C4), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[img_spec] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, C4), dtype),
        scratch_shapes=[
            pltpu.VMEM((P, Ch), dtype),               # x1
            pltpu.VMEM((P + 2 * (Wd + 1), Ch), dtype),  # padded 3x3 operand
        ],
        # double-buffered [P, C4] in+out blocks alone exceed Mosaic's 16 MiB
        # default scoped-vmem budget at P=6400, C4=192 f32 (~20 MiB); the
        # whole working set is ~26 MiB — far under the v5e's 128 MiB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yflat, W1.astype(dtype), b1.astype(jnp.float32),
      W2.astype(dtype), b2.astype(jnp.float32),
      Wa.astype(dtype), ba.astype(jnp.float32),
      Wb.astype(dtype), bb.astype(jnp.float32),
      W3.astype(dtype), b3.astype(jnp.float32))
    return out.reshape(B, H, Wd, C4)


__all__ = ["c3_s2d_fused"]
