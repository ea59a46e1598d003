"""Per-stage profile of the s2d fast engine (models/yolox_fast.py).

Scan-amortized like _yolox_stage_profile_r3.py.  Run alone.
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
model = Yolox.from_variant("tiny")
img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
variables = model.init(jax.random.PRNGKey(0), img)
params, stats = variables["params"], variables["batch_stats"]
bp, bs = params["backbone"], stats["backbone"]
bbp, bbs = bp["backbone"], bs["backbone"]
hp, hs = params["head"], stats["head"]
bd = max(round(model.depth * 3), 1)
nn_ = round(3 * model.depth)
w_ = model.width
in_ch = [int(256 * w_), int(512 * w_), int(1024 * w_)]


def prof(name, fn, in_specs, iters=8):
    xs = []
    for shape, dtype in in_specs:
        if dtype == jnp.uint8:
            xs.append(jnp.asarray(rng.integers(0, 256, shape), jnp.uint8))
        else:
            xs.append(jnp.asarray(rng.standard_normal(shape), dtype))
    xs = tuple(xs)

    @jax.jit
    def run(xs, seed):
        def body(acc, _):
            pert = tuple(x.astype(jnp.float32) + acc * 1e-30 if x.dtype == jnp.uint8
                         else x + acc * 1e-30 for x in xs)
            y = fn(*pert)
            leaf = y[0] if isinstance(y, tuple) else y
            return jnp.mean(leaf).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(xs, s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters) / REP
    print(f"{name:24s} {dt*1000/B:7.3f} ms/frame ({B/dt:7.1f} fps)", flush=True)
    return dt


prof("FULL apply_fast", lambda x: yf.apply_fast(model, variables, x),
     [((B, 640, 640, 3), jnp.uint8)])

prof("stem+dark2 s2d", lambda x: yf._stem_dark2_s2d(bbp, bbs, x, bd),
     [((B, 640, 640, 3), jnp.uint8)])

prof("dark3", lambda x: yf._csp_block(bbp["dark3"], bbs["dark3"], x, bd * 3, False),
     [((B, 160, 160, 48), jnp.float32)])
prof("dark4", lambda x: yf._csp_block(bbp["dark4"], bbs["dark4"], x, bd * 3, False),
     [((B, 80, 80, 96), jnp.float32)])
prof("dark5", lambda x: yf._csp_block(bbp["dark5"], bbs["dark5"], x, bd, True),
     [((B, 40, 40, 192), jnp.float32)])


def neck(f1, f2, f3):
    fpn_out0 = yf._base_conv(bp["lateral_conv0"], bs["lateral_conv0"], f3)
    y = jnp.concatenate([yf._upsample2(fpn_out0), f2], axis=-1)
    f_out0 = yf._csp_bottleneck(bp["c3_p4"], bs["c3_p4"], y, nn_, False)
    fpn_out1 = yf._base_conv(bp["reduce_conv1"], bs["reduce_conv1"], f_out0)
    y = jnp.concatenate([yf._upsample2(fpn_out1), f1], axis=-1)
    pan_out2 = yf._csp_bottleneck(bp["c3_p3"], bs["c3_p3"], y, nn_, False)
    y = yf._base_conv(bp["bu_conv2"], bs["bu_conv2"], pan_out2, stride=2)
    y = jnp.concatenate([y, fpn_out1], axis=-1)
    pan_out1 = yf._csp_bottleneck(bp["c3_n3"], bs["c3_n3"], y, nn_, False)
    y = yf._base_conv(bp["bu_conv1"], bs["bu_conv1"], pan_out1, stride=2)
    y = jnp.concatenate([y, fpn_out0], axis=-1)
    pan_out0 = yf._csp_bottleneck(bp["c3_n4"], bs["c3_n4"], y, nn_, False)
    return pan_out2, pan_out1, pan_out0


prof("neck", neck, [((B, 80, 80, 96), jnp.float32),
                    ((B, 40, 40, 192), jnp.float32),
                    ((B, 20, 20, 384), jnp.float32)])


def head(p2, p1, p0):
    outs = []
    for i, feat in enumerate((p2, p1, p0)):
        feat = yf._base_conv(hp[f"stems_{i}"], hs[f"stems_{i}"], feat)
        cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv0"], hs[f"cls_convs_{i}"]["conv0"], feat)
        cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv1"], hs[f"cls_convs_{i}"]["conv1"], cf)
        cls_out = yf._conv(cf, hp[f"cls_preds_{i}"]["kernel"], hp[f"cls_preds_{i}"]["bias"], act=False)
        rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv0"], hs[f"reg_convs_{i}"]["conv0"], feat)
        rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv1"], hs[f"reg_convs_{i}"]["conv1"], rf)
        reg_out = yf._conv(rf, hp[f"reg_preds_{i}"]["kernel"], hp[f"reg_preds_{i}"]["bias"], act=False)
        obj_out = yf._conv(rf, hp[f"obj_preds_{i}"]["kernel"], hp[f"obj_preds_{i}"]["bias"], act=False)
        out = jnp.concatenate([reg_out, jax.nn.sigmoid(obj_out), jax.nn.sigmoid(cls_out)], axis=-1)
        b_, h_, ww_, c_ = out.shape
        outs.append(out.reshape(b_, h_ * ww_, c_))
    return jnp.concatenate(outs, axis=1)


prof("head (no decode)", head, [((B, 80, 80, in_ch[0]), jnp.float32),
                                ((B, 40, 40, in_ch[1]), jnp.float32),
                                ((B, 20, 20, in_ch[2]), jnp.float32)])
