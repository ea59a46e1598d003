"""Conv layout variants for the small-channel YOLOX stages (dark2/dark3).

The (8,128)-tiled f32 HBM layout pads C=24..48 activations to 128 lanes, so
these stages run ~46x under the compute roofline (PERF_NOTES round 3).
Candidates, timed per-conv with scan amortization (timing only — exact
kernel construction for the s2d forms lives in models/yolox_s2d.py):

  NHWC      — current (flax default)
  NCHW      — W on lanes (320 pads 1.2x instead of C 5.3x)
  s2d       — operate on space-to-depth activations [H/2,W/2,4C]: stride-2
              3x3 becomes k=3/s=2 over 4C->4Cout; stride-1 3x3 becomes
              k=3/s=1 over 4C->4C; 1x1 becomes block-diagonal 1x1 4C->4Cout.
              4x FLOPs (zeros in the constructed kernel) for ~4x less
              padded traffic.

Run alone: python examples/_dark2_conv_variants.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench import _bench

B = 8
REP = 16
rng = np.random.default_rng(0)


def time_conv(name, in_shape, w_shape, stride, dims, pad="SAME", iters=8):
    x0 = jnp.asarray(rng.standard_normal(in_shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal(w_shape) * 0.05, jnp.float32)

    @jax.jit
    def run(seed):
        def body(acc, _):
            x = x0 + acc * 1e-30
            y = lax.conv_general_dilated(
                x, w, (stride, stride), pad, dimension_numbers=dims)
            return jnp.mean(y), None
        acc, _ = lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters) / REP
    print(f"{name:34s} {dt*1000/B:7.4f} ms/frame", flush=True)
    return dt


NHWC = ("NHWC", "HWIO", "NHWC")
NCHW = ("NCHW", "OIHW", "NCHW")

print("== dark2 entry conv: 3x3/s2 24->48 @ 320x320 ==")
time_conv("NHWC", (B, 320, 320, 24), (3, 3, 24, 48), 2, NHWC)
time_conv("NCHW", (B, 24, 320, 320), (48, 24, 3, 3), 2, NCHW)
time_conv("s2d  3x3/s2 96->192 @160 (->80)", (B, 160, 160, 96),
          (3, 3, 96, 192), 2, NHWC)

print("== dark2 C3 3x3/s1 24->24 @ 160x160 ==")
time_conv("NHWC", (B, 160, 160, 24), (3, 3, 24, 24), 1, NHWC)
time_conv("NCHW", (B, 24, 160, 160), (24, 24, 3, 3), 1, NCHW)
time_conv("s2d  3x3/s1 96->96 @80", (B, 80, 80, 96), (3, 3, 96, 96), 1, NHWC)

print("== dark2 C3 1x1 48->24 @ 160x160 ==")
time_conv("NHWC", (B, 160, 160, 48), (1, 1, 48, 24), 1, NHWC)
time_conv("NCHW", (B, 48, 160, 160), (24, 48, 1, 1), 1, NCHW)
time_conv("s2d  1x1 192->96 @80", (B, 80, 80, 192), (1, 1, 192, 96), 1, NHWC)

print("== dark3 entry conv: 3x3/s2 48->96 @ 160x160 ==")
time_conv("NHWC", (B, 160, 160, 48), (3, 3, 48, 96), 2, NHWC)
time_conv("NCHW", (B, 48, 160, 160), (96, 48, 3, 3), 2, NCHW)
time_conv("s2d  3x3/s2 192->384 @80 (->40)", (B, 80, 80, 192),
          (3, 3, 192, 384), 2, NHWC)

print("== dark3 C3 3x3/s1 48->48 @ 80x80 ==")
time_conv("NHWC", (B, 80, 80, 48), (3, 3, 48, 48), 1, NHWC)
time_conv("NCHW", (B, 48, 80, 80), (48, 48, 3, 3), 1, NCHW)
time_conv("s2d  3x3/s1 192->192 @40", (B, 40, 40, 192), (3, 3, 192, 192), 1,
          NHWC)

print("== stem conv after s2d reshape: 3x3/s1 12->24 @ 320x320 ==")
time_conv("NHWC", (B, 320, 320, 12), (3, 3, 12, 24), 1, NHWC)
time_conv("s2d  3x3/s1 48->96 @160", (B, 160, 160, 48), (3, 3, 48, 96), 1,
          NHWC)
