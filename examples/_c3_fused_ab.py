"""Round-5 same-process A/B: fused C3 Pallas kernel vs the XLA s2d path.

WARNING (bench-form audit, PERF_NOTES round 5): bench_full's step chains
through `out[0,0,0] * 0` with a closure-constant image — BOTH invalid
(XLA dead-codes / constant-hoists; numbers are inflated 20-80%).  The
STAGE A/B (bench_stage) chains full tensors and remains valid; for full-
model numbers use bench.py's audited steps instead.

Measures (tiny/s @640, batch 8, scan-amortized like bench.py's yolox
config):
  1. isolated stem+dark2 stage: XLA _c3_s2d vs pallas c3_s2d_fused,
     f32 and bf16
  2. full apply_fast: fuse_c3 False/True x dtype f32/bf16

VERDICT r4 #1: per-stage floors sum to 0.344 ms/frame (2907 fps); the
~0.21 ms/frame gap is inter-conv HBM traffic inside this C3.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import Yolox
from gst_plugins_rs_tpu.models import yolox_fast as yf
from gst_plugins_rs_tpu.ops.pallas_yolox_c3 import c3_s2d_fused

B = 8
REP = 8


def stage_inputs(variant, dtype):
    rng = np.random.default_rng(0)
    model = Yolox.from_variant(variant)
    img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0), img)
    base_depth = max(round(model.depth * 3), 1)
    bp = variables["params"]["backbone"]["backbone"]
    bs = variables["batch_stats"]["backbone"]["backbone"]
    d2p, d2s = bp["dark2"], bs["dark2"]
    # build the C3 input (post entry conv) once
    b, h, w, c = img.shape
    y = img.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 6, 3, 7).reshape(b, h // 4, w // 4, 16 * c)
    y = y.astype(dtype)
    st = bp["stem"]["conv"], bs["stem"]["conv"]
    W, bb = yf._fold_bn(st[0]["conv"], st[0]["bn"], st[1]["bn"])
    y = yf._conv(y, yf.s2d_kernel_s1(W), yf._tile4(bb))
    W, bb = yf._fold_bn(d2p["conv"]["conv"], d2p["conv"]["bn"],
                        d2s["conv"]["bn"])
    y = jax.jit(lambda t: yf._conv(t, yf.s2d_kernel_s2(W), yf._tile4(bb),
                                   stride=2))(y)
    return model, variables, d2p, d2s, base_depth, y, img


def bench_stage(variant, dtype):
    model, variables, d2p, d2s, n, y, _ = stage_inputs(variant, dtype)
    wts = yf._c3_fused_weights(d2p["c3"], d2s["c3"], n)
    width = y.shape[2]

    @jax.jit
    def xla_step(t):
        for _ in range(REP):
            t = yf._c3_s2d(d2p["c3"], d2s["c3"], t, n)[:, :, :, :t.shape[3]]
        return t

    @jax.jit
    def pallas_step(t):
        for _ in range(REP):
            t = c3_s2d_fused(t, **wts, width=width, n=n)
        return t

    name = f"{variant}/{jnp.dtype(dtype).name}"
    try:
        dt = _bench(pallas_step, y, iters=12) / (REP * B)
        print(f"stage {name} pallas : {dt*1e3:8.3f} ms/frame")
    except Exception as e:
        print(f"stage {name} pallas : FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")
    dt = _bench(xla_step, y, iters=12) / (REP * B)
    print(f"stage {name} xla    : {dt*1e3:8.3f} ms/frame")


def bench_full(variant, dtype, fuse):
    rng = np.random.default_rng(0)
    model = Yolox.from_variant(variant)
    img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0), img)
    s2d_dtype = jnp.bfloat16 if dtype == "bf16" else None

    @jax.jit
    def step(carry):
        out = yf.apply_fast(model, variables, img + carry.astype(jnp.uint8),
                            s2d_dtype=s2d_dtype, fuse_c3=fuse)
        return (out[0, 0, 0] * 0).astype(jnp.float32)

    tag = f"full {variant}/{dtype} fuse={int(fuse)}"
    try:
        dt = _bench(step, jnp.float32(0.0), iters=12) / B
        print(f"{tag}: {dt*1e3:8.3f} ms/frame = {1.0/dt*1:8.1f} fps "
              f"(batch rate {B/dt:.0f})")
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    for variant in ("tiny", "s"):
        for dtype in (jnp.float32, jnp.bfloat16):
            bench_stage(variant, dtype)
    for variant in ("tiny", "s"):
        for dtype in ("f32", "bf16"):
            for fuse in (False, True):
                bench_full(variant, dtype, fuse)
