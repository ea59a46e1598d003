"""Round-4 same-process A/B: shipped apply_fast vs candidate engine changes.

Candidates (all exact or float-tolerance rewrites):
  A. cast-after-reshape: Focus16 transform in u8, cast once at the end
     (isolated win 0.016 -> 0.007 ms/frame in _yolox_r4_variants.py).
  B. bf16 stem+dark2: the s2d stage's inter-conv activations in bf16
     (halves the dominant stage's HBM traffic), back to f32 at un_s2d.
  C. fused head preds: per scale, one 1x1 conv over concat([rf, cf])
     producing [reg4|obj1|cls80] directly in output order (one padded
     write instead of three + concat).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import Yolox, _decode, _upsample2
from gst_plugins_rs_tpu.models import yolox_fast as yf

B = 8
REP = 16
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
model = Yolox.from_variant("tiny")
variables = model.init(jax.random.PRNGKey(0), img)


def stem_dark2_variant(params, stats, x, base_depth, cast_last, s2d_dtype):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 6, 3, 7)
    y = y.reshape(b, h // 4, w // 4, 16 * c)
    y = y.astype(s2d_dtype)

    st = params["stem"]["conv"], stats["stem"]["conv"]
    W, bb = yf._fold_bn(st[0]["conv"], st[0]["bn"], st[1]["bn"])
    y = yf._conv(y, yf.s2d_kernel_s1(W), yf._tile4(bb))

    d2p, d2s = params["dark2"], stats["dark2"]
    W, bb = yf._fold_bn(d2p["conv"]["conv"], d2p["conv"]["bn"],
                        d2s["conv"]["bn"])
    y = yf._conv(y, yf.s2d_kernel_s2(W), yf._tile4(bb), stride=2)
    y = yf._c3_s2d(d2p["c3"], d2s["c3"], y, base_depth)
    return yf.un_s2d(y).astype(jnp.float32)


def fused_head_scale(hp, hs, i, feat):
    feat = yf._base_conv(hp[f"stems_{i}"], hs[f"stems_{i}"], feat)
    cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv0"],
                       hs[f"cls_convs_{i}"]["conv0"], feat)
    cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv1"],
                       hs[f"cls_convs_{i}"]["conv1"], cf)
    rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv0"],
                       hs[f"reg_convs_{i}"]["conv0"], feat)
    rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv1"],
                       hs[f"reg_convs_{i}"]["conv1"], rf)
    Wr = hp[f"reg_preds_{i}"]["kernel"]
    Wo = hp[f"obj_preds_{i}"]["kernel"]
    Wc = hp[f"cls_preds_{i}"]["kernel"]
    hc = Wr.shape[2]
    nc = Wc.shape[3]
    K = jnp.zeros((1, 1, 2 * hc, 5 + nc), Wr.dtype)
    K = K.at[:, :, :hc, 0:4].set(Wr)
    K = K.at[:, :, :hc, 4:5].set(Wo)
    K = K.at[:, :, hc:, 5:].set(Wc)
    bias = jnp.concatenate([hp[f"reg_preds_{i}"]["bias"],
                            hp[f"obj_preds_{i}"]["bias"],
                            hp[f"cls_preds_{i}"]["bias"]])
    z = jnp.concatenate([rf, cf], axis=-1)
    out = yf._conv(z, K, bias, act=False)
    return jnp.concatenate(
        [out[..., :4], jax.nn.sigmoid(out[..., 4:])], axis=-1)


def apply_variant(x, cast_last=True, s2d_dtype=jnp.float32, fused_head=True):
    params = variables["params"]
    stats = variables["batch_stats"]
    bp, bs = params["backbone"], stats["backbone"]
    bbp, bbs = bp["backbone"], bs["backbone"]
    base_depth = max(round(model.depth * 3), 1)
    n_neck = round(3 * model.depth)

    x = stem_dark2_variant(bbp, bbs, x, base_depth, cast_last, s2d_dtype)
    f1 = yf._csp_block(bbp["dark3"], bbs["dark3"], x, base_depth * 3, False)
    f2 = yf._csp_block(bbp["dark4"], bbs["dark4"], f1, base_depth * 3, False)
    f3 = yf._csp_block(bbp["dark5"], bbs["dark5"], f2, base_depth, True)

    fpn_out0 = yf._base_conv(bp["lateral_conv0"], bs["lateral_conv0"], f3)
    y = jnp.concatenate([_upsample2(fpn_out0), f2], axis=-1)
    f_out0 = yf._csp_bottleneck(bp["c3_p4"], bs["c3_p4"], y, n_neck, False)
    fpn_out1 = yf._base_conv(bp["reduce_conv1"], bs["reduce_conv1"], f_out0)
    y = jnp.concatenate([_upsample2(fpn_out1), f1], axis=-1)
    pan_out2 = yf._csp_bottleneck(bp["c3_p3"], bs["c3_p3"], y, n_neck, False)
    y = yf._base_conv(bp["bu_conv2"], bs["bu_conv2"], pan_out2, stride=2)
    y = jnp.concatenate([y, fpn_out1], axis=-1)
    pan_out1 = yf._csp_bottleneck(bp["c3_n3"], bs["c3_n3"], y, n_neck, False)
    y = yf._base_conv(bp["bu_conv1"], bs["bu_conv1"], pan_out1, stride=2)
    y = jnp.concatenate([y, fpn_out0], axis=-1)
    pan_out0 = yf._csp_bottleneck(bp["c3_n4"], bs["c3_n4"], y, n_neck, False)

    hp, hs = params["head"], stats["head"]
    outs, shapes = [], []
    for i, feat in enumerate((pan_out2, pan_out1, pan_out0)):
        if fused_head:
            out = fused_head_scale(hp, hs, i, feat)
        else:
            feat = yf._base_conv(hp[f"stems_{i}"], hs[f"stems_{i}"], feat)
            cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv0"],
                               hs[f"cls_convs_{i}"]["conv0"], feat)
            cf = yf._base_conv(hp[f"cls_convs_{i}"]["conv1"],
                               hs[f"cls_convs_{i}"]["conv1"], cf)
            cls_out = yf._conv(cf, hp[f"cls_preds_{i}"]["kernel"],
                               hp[f"cls_preds_{i}"]["bias"], act=False)
            rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv0"],
                               hs[f"reg_convs_{i}"]["conv0"], feat)
            rf = yf._base_conv(hp[f"reg_convs_{i}"]["conv1"],
                               hs[f"reg_convs_{i}"]["conv1"], rf)
            reg_out = yf._conv(rf, hp[f"reg_preds_{i}"]["kernel"],
                               hp[f"reg_preds_{i}"]["bias"], act=False)
            obj_out = yf._conv(rf, hp[f"obj_preds_{i}"]["kernel"],
                               hp[f"obj_preds_{i}"]["bias"], act=False)
            out = jnp.concatenate(
                [reg_out, jax.nn.sigmoid(obj_out), jax.nn.sigmoid(cls_out)],
                axis=-1)
        b_, h_, w_, c_ = out.shape
        shapes.append((h_, w_))
        outs.append(out.reshape(b_, h_ * w_, c_))
    out = jnp.concatenate(outs, axis=1).astype(jnp.float32)
    return _decode(out, shapes)


def prof(name, fn, iters=6):
    @jax.jit
    def run(x, seed):
        def body(acc, _):
            xx = (x.astype(jnp.float32) + acc * 1e-30).astype(jnp.uint8)
            y = fn(xx)
            return jnp.mean(y).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(img, s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters) / REP
    print(f"{name:36s} {dt*1000/B:7.3f} ms/frame ({B/dt:8.1f} fps)",
          flush=True)
    return dt


if __name__ == "__main__":
    # numeric check first (jit: eager dispatch over the relay is ~0.5s/op)
    ref = jax.jit(lambda x: yf.apply_fast(model, variables, x))(img)
    for nm, kw in [("AB bf16-stem", dict(s2d_dtype=jnp.bfloat16,
                                         fused_head=False)),
                   ("AC fused-head", dict(s2d_dtype=jnp.float32,
                                          fused_head=True))]:
        v = jax.jit(lambda x, kw=kw: apply_variant(x, **kw))(img)
        rel = float(jnp.max(jnp.abs(v - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"{nm}: max rel err vs shipped = {rel:.2e}", flush=True)

    prof("shipped apply_fast",
         lambda x: yf.apply_fast(model, variables, x))
    prof("A cast-last",
         lambda x: apply_variant(x, s2d_dtype=jnp.float32, fused_head=False))
    prof("AC fused-head",
         lambda x: apply_variant(x, s2d_dtype=jnp.float32, fused_head=True))
    prof("AB bf16-stem",
         lambda x: apply_variant(x, s2d_dtype=jnp.bfloat16, fused_head=False))
    prof("ABC all",
         lambda x: apply_variant(x, s2d_dtype=jnp.bfloat16, fused_head=True))
    prof("shipped apply_fast (again)",
         lambda x: yf.apply_fast(model, variables, x))
