"""Round-4 YOLOX variant hunt: where does the non-conv stem time go?

Measures (scan-amortized like _yolox_stage_profile_r3.py, run alone):
  1. the isolated Focus16 input transform (u8 [B,640,640,3] ->
     f32 [B,160,160,48]) in several formulations,
  2. full-model A/Bs: baseline apply_fast vs cast-after-reshape vs
     fused-head vs bf16-stem+dark2.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import Yolox
from gst_plugins_rs_tpu.models import yolox_fast as yf

B = 8
REP = 16
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)


def prof(name, fn, iters=8):
    @jax.jit
    def run(x, seed):
        def body(acc, _):
            y = fn(x, acc)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return jnp.mean(leaf).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(img, s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters) / REP
    print(f"{name:34s} {dt*1000/B:7.3f} ms/frame ({B/dt:8.1f} fps)", flush=True)
    return dt


def focus16_cast_first(x, acc):
    x = x.astype(jnp.float32) + acc * 1e-30
    b, h, w, c = x.shape
    y = x.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 6, 3, 7)
    return y.reshape(b, h // 4, w // 4, 16 * c)


def focus16_cast_last(x, acc):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 6, 3, 7)
    y = y.reshape(b, h // 4, w // 4, 16 * c)
    return y.astype(jnp.float32) + acc * 1e-30


def focus16_rowsplit(x, acc):
    # avoid the 8-d transpose: slice 4 row/col phases then concat (like the
    # original Focus but 16-way) — XLA sees strided slices of u8.
    b, h, w, c = x.shape
    parts = []
    for e2 in range(2):
        for f2 in range(2):
            for f1 in range(2):
                for e1 in range(2):
                    parts.append(x[:, 2 * e2 + e1::4, 2 * f2 + f1::4, :])
    y = jnp.concatenate(parts, axis=-1)
    return y.astype(jnp.float32) + acc * 1e-30


if __name__ == "__main__":
    print("== isolated Focus16 input transform ==")
    prof("focus16 cast-first (shipped)", focus16_cast_first)
    prof("focus16 cast-last", focus16_cast_last)
    prof("focus16 rowsplit-slices", focus16_rowsplit)

    model = Yolox.from_variant("tiny")
    variables = model.init(jax.random.PRNGKey(0), img)

    print("== full model ==")
    prof("apply_fast (shipped)",
         lambda x, acc: yf.apply_fast(
             model, variables,
             (x.astype(jnp.float32) + acc * 1e-30).astype(jnp.uint8)),
         iters=6)
