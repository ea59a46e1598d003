"""TPU-optimized YOLOX inference engine over the standard variables tree.

Same weights, same outputs (float-associativity tolerance), different
schedule: the reference-shaped flax model (models/yolox.py) keeps NHWC
activations whose C=12..48 early stages lane-pad 3-10x in the (8,128)
tiled TPU layout — measured 82% of model time (PERF_NOTES round 3).
This engine runs the stem and dark2 (and their elementwise tails) in the
space-to-depth domain: activations [H/2, W/2, 4C] with kernels constructed
EXACTLY from the original 3x3/1x1 kernels, so the math is unchanged while
lane padding drops to 1.33x.  BatchNorm is folded into conv weights at
trace time (variables are closed over, so XLA constant-folds both the
folding and the s2d kernel construction).

Parity: analytics/burn/src/yoloxinference/imp.rs:415-472 runs the same
weights through burn's NCHW graph; this is the TPU-native equivalent.
Depthwise variants (nano) fall back to the reference-shaped model.

s2d conventions (phase-major channels, c = (2*e + f) * C + c_orig with
e = row offset, f = col offset):
  - 3x3 stride-1 conv  -> k=3/s=1 conv over 4C -> 4C_out blocks, tap
    (u, e) lands on block row rb = (e+u+1)//2, phase e' = (e+u+1)%2.
  - 3x3 stride-2 conv  -> k=3/s=2: rb = (2e+u-1)//2 + 1, e' = (2e+u+1-2rb).
  - 1x1 conv           -> block-diagonal 1x1 over phases.
All constructions are verified numerically against the flax model in
tests/test_yolox_fast.py.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .yolox import Yolox, _decode, _upsample2

_DN = ("NHWC", "HWIO", "NHWC")
_EPS = 1e-3


def _fold_bn(conv_params, bn_params, bn_stats):
    """Fold inference BatchNorm into conv kernel + bias (exact)."""
    W = conv_params["kernel"]
    inv = bn_params["scale"] * lax.rsqrt(bn_stats["var"] + _EPS)
    b = bn_params["bias"] - bn_stats["mean"] * inv
    return W * inv[None, None, None, :], b


def _conv(x, W, b, stride=1, act=True):
    k = W.shape[0]
    p = (k - 1) // 2
    y = lax.conv_general_dilated(
        x, W.astype(x.dtype), (stride, stride), [(p, p), (p, p)],
        dimension_numbers=_DN)
    y = y + b.astype(y.dtype)
    return jax.nn.silu(y) if act else y


# ---------------------------------------------------------------------------
# s2d kernel constructors (exact; verified in tests/test_yolox_fast.py)
# ---------------------------------------------------------------------------
def s2d(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel (2e+f)*C + c."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def un_s2d(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)


def s2d_kernel_s1(W):
    """3x3/s1 kernel [3,3,Ci,Co] -> s2d-domain [3,3,4Ci,4Co]."""
    ci, co = W.shape[2], W.shape[3]
    K = jnp.zeros((3, 3, 4 * ci, 4 * co), W.dtype)
    for e in range(2):
        for u in range(3):
            rb, ep = (e + u + 1) // 2, (e + u + 1) % 2
            for f in range(2):
                for v in range(3):
                    cb, fp = (f + v + 1) // 2, (f + v + 1) % 2
                    ip, op = 2 * ep + fp, 2 * e + f
                    K = K.at[rb, cb, ip * ci:(ip + 1) * ci,
                             op * co:(op + 1) * co].set(W[u, v])
    return K


def s2d_kernel_s2(W):
    """3x3/s2 kernel [3,3,Ci,Co] -> s2d-in/s2d-out [3,3,4Ci,4Co] (k=3/s=2
    on the block grid: input [H/2,W/2,4Ci] -> output [H/4,W/4,4Co])."""
    ci, co = W.shape[2], W.shape[3]
    K = jnp.zeros((3, 3, 4 * ci, 4 * co), W.dtype)
    for e in range(2):
        for u in range(3):
            rb = (2 * e + u - 1) // 2 + 1
            ep = 2 * e + u + 1 - 2 * rb
            for f in range(2):
                for v in range(3):
                    cb = (2 * f + v - 1) // 2 + 1
                    fp = 2 * f + v + 1 - 2 * cb
                    ip, op = 2 * ep + fp, 2 * e + f
                    K = K.at[rb, cb, ip * ci:(ip + 1) * ci,
                             op * co:(op + 1) * co].set(W[u, v])
    return K


def s2d_kernel_1x1(W):
    """1x1 kernel [1,1,Ci,Co] -> block-diagonal [1,1,4Ci,4Co]."""
    ci, co = W.shape[2], W.shape[3]
    K = jnp.zeros((1, 1, 4 * ci, 4 * co), W.dtype)
    for p in range(4):
        K = K.at[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(W[0, 0])
    return K


def _interleave_rows(K, c_a, c_b):
    """Reorder a canonical s2d kernel's input channels (phase, concat(a,b))
    to consume a NAIVE concat of two s2d tensors ((phase,a) ++ (phase,b))."""
    c = c_a + c_b
    # order[naive_idx] = canonical_idx (first 4*c_a naive rows are a's phases)
    order = np.concatenate([
        (np.arange(4)[:, None] * c + np.arange(c_a)[None, :]).reshape(-1),
        (np.arange(4)[:, None] * c + c_a + np.arange(c_b)[None, :]).reshape(-1),
    ])
    return K[:, :, order, :]


def _tile4(b):
    return jnp.tile(b, 4)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _base_conv(params, stats, x, stride=1):
    W, b = _fold_bn(params["conv"], params["bn"], stats["bn"])
    return _conv(x, W, b, stride)


def _csp_bottleneck(params, stats, x, n, shortcut):
    """CspBottleneck (C3) in the normal domain."""
    x1 = _base_conv(params["conv1"], stats["conv1"], x)
    x2 = _base_conv(params["conv2"], stats["conv2"], x)
    for i in range(n):
        p, s = params[f"m_{i}"], stats[f"m_{i}"]
        y = _base_conv(p["conv1"], s["conv1"], x1)
        y = _base_conv(p["conv2"], s["conv2"], y)
        x1 = x1 + y if shortcut else y
    return _base_conv(params["conv3"], stats["conv3"],
                      jnp.concatenate([x1, x2], axis=-1))


def _spp(params, stats, x):
    x = _base_conv(params["conv1"], stats["conv1"], x)
    pools = [x]
    for k in (5, 9, 13):
        pad = k // 2
        pools.append(lax.reduce_window(
            x, jnp.array(-jnp.inf, x.dtype), lax.max,
            (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)]))
    return _base_conv(params["conv2"], stats["conv2"],
                      jnp.concatenate(pools, axis=-1))


def _csp_block(params, stats, x, n, spp):
    x = _base_conv(params["conv"], stats["conv"], x, stride=2)
    if spp:
        x = _spp(params["spp"], stats["spp"], x)
    return _csp_bottleneck(params["c3"], stats["c3"], x, n, not spp)


def _stem_dark2_s2d(params, stats, x, base_depth, s2d_dtype, out_dtype,
                    fuse_c3=False, interpret=False):
    """stem + dark2 entirely in the s2d domain.

    x: [B,H,W,3] u8 or float.  Returns [B,H/4,W/4,2*base_ch] (dark2
    output, float32).  The Focus16 transform runs in the INPUT dtype and
    casts once at the end: u8 rows don't lane-pad, so transposing before
    casting reads 1.2 MB/frame instead of 4.9 (isolated: 0.016 -> 0.007
    ms/frame, examples/_yolox_r4_variants.py).  s2d_dtype=bfloat16 halves
    the stage's inter-conv HBM traffic (engine=fast-bf16; detections
    gated in tests/test_yolox_fast.py)."""
    b, h, w, c = x.shape
    # fused Focus(s2d, reference channel order (f1,e1,c)) + second s2d:
    # image row = 4p + 2e2 + e1, col = 4q + 2f2 + f1; channels
    # (e2,f2, f1,e1,c) phase-major over the Focus channel (f1*2+e1)*3+c.
    y = x.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    #            b   p     e2 e1  q     f2 f1  c
    y = y.transpose(0, 1, 4, 2, 5, 6, 3, 7)  # b p q e2 f2 f1 e1 c
    y = y.reshape(b, h // 4, w // 4, 16 * c)
    y = y.astype(s2d_dtype)

    st = params["stem"]["conv"], stats["stem"]["conv"]
    W, bb = _fold_bn(st[0]["conv"], st[0]["bn"], st[1]["bn"])
    y = _conv(y, s2d_kernel_s1(W), _tile4(bb))           # [B,160,160,4*bc]

    d2p, d2s = params["dark2"], stats["dark2"]
    W, bb = _fold_bn(d2p["conv"]["conv"], d2p["conv"]["bn"],
                     d2s["conv"]["bn"])
    y = _conv(y, s2d_kernel_s2(W), _tile4(bb), stride=2)  # [B,80,80,8*bc]

    if fuse_c3:
        from ..ops.pallas_yolox_c3 import c3_s2d_fused
        wts = _c3_fused_weights(d2p["c3"], d2s["c3"], base_depth)
        y = c3_s2d_fused(y, **wts, width=y.shape[2], n=base_depth,
                         interpret=interpret)
    else:
        y = _c3_s2d(d2p["c3"], d2s["c3"], y, base_depth)
    return un_s2d(y).astype(out_dtype)                    # [B,160,160,2*bc]


def _c3_fused_weights(c3p, c3s, n):
    """Fold + flatten the C3 params into the 2D matrices the fused Pallas
    kernel (ops/pallas_yolox_c3.py) consumes.  All constructions are
    trace-time constants (XLA folds them once per compile)."""
    W1, b1 = _fold_bn(c3p["conv1"]["conv"], c3p["conv1"]["bn"],
                      c3s["conv1"]["bn"])
    W2, b2 = _fold_bn(c3p["conv2"]["conv"], c3p["conv2"]["bn"],
                      c3s["conv2"]["bn"])
    hidden = W1.shape[3]
    Was, bas, Wbs, bbs = [], [], [], []
    for i in range(n):
        mp, ms = c3p[f"m_{i}"], c3s[f"m_{i}"]
        Wa, ba = _fold_bn(mp["conv1"]["conv"], mp["conv1"]["bn"],
                          ms["conv1"]["bn"])
        Wb, bb = _fold_bn(mp["conv2"]["conv"], mp["conv2"]["bn"],
                          ms["conv2"]["bn"])
        Was.append(s2d_kernel_1x1(Wa)[0, 0])
        bas.append(_tile4(ba)[None])
        Kb = s2d_kernel_s1(Wb)                      # [3, 3, Ch, Ch]
        Wbs.extend(Kb[u, v] for u in range(3) for v in range(3))
        bbs.append(_tile4(bb)[None])
    W3, b3 = _fold_bn(c3p["conv3"]["conv"], c3p["conv3"]["bn"],
                      c3s["conv3"]["bn"])
    K3 = _interleave_rows(s2d_kernel_1x1(W3), hidden, hidden)
    return dict(
        W1=s2d_kernel_1x1(W1)[0, 0], b1=_tile4(b1)[None],
        W2=s2d_kernel_1x1(W2)[0, 0], b2=_tile4(b2)[None],
        Wa=jnp.stack(Was), ba=jnp.stack(bas),
        Wb=jnp.stack(Wbs), bb=jnp.stack(bbs),
        W3=K3[0, 0], b3=_tile4(b3)[None],
    )


def _c3_s2d(c3p, c3s, y, n):
    """CspBottleneck (shortcut branch form — the non-SPP CspBlock C3) on an
    s2d-domain input, entirely in the s2d domain."""
    W1, b1 = _fold_bn(c3p["conv1"]["conv"], c3p["conv1"]["bn"],
                      c3s["conv1"]["bn"])
    W2, b2 = _fold_bn(c3p["conv2"]["conv"], c3p["conv2"]["bn"],
                      c3s["conv2"]["bn"])
    hidden = W1.shape[3]
    x1 = _conv(y, s2d_kernel_1x1(W1), _tile4(b1))
    x2 = _conv(y, s2d_kernel_1x1(W2), _tile4(b2))
    for i in range(n):
        mp, ms = c3p[f"m_{i}"], c3s[f"m_{i}"]
        Wa, ba = _fold_bn(mp["conv1"]["conv"], mp["conv1"]["bn"],
                          ms["conv1"]["bn"])
        Wb, bbk = _fold_bn(mp["conv2"]["conv"], mp["conv2"]["bn"],
                           ms["conv2"]["bn"])
        t = _conv(x1, s2d_kernel_1x1(Wa), _tile4(ba))
        t = _conv(t, s2d_kernel_s1(Wb), _tile4(bbk))
        x1 = x1 + t  # non-SPP C3 always shortcut
    W3, b3 = _fold_bn(c3p["conv3"]["conv"], c3p["conv3"]["bn"],
                      c3s["conv3"]["bn"])
    K3 = _interleave_rows(s2d_kernel_1x1(W3), hidden, hidden)
    return _conv(jnp.concatenate([x1, x2], axis=-1), K3, _tile4(b3))


def apply_fast(model: Yolox, variables: Dict[str, Any], x,
               dtype=jnp.float32, s2d_dtype=None, fuse_c3=False,
               interpret=False):
    """Drop-in replacement for model.apply(variables, x) (non-depthwise
    variants; others delegate to the flax model).

    s2d_dtype: activation dtype for the s2d stem+dark2 stage only
    (defaults to dtype).  bfloat16 is the engine=fast-bf16 path: exact
    detections are preserved (gated at the detection level in
    tests/test_yolox_fast.py) while the dominant stage's HBM traffic
    halves; the rest of the model stays in `dtype`.

    fuse_c3: run dark2's C3 as the single fused Pallas kernel
    (ops/pallas_yolox_c3.py) instead of per-conv XLA dispatches —
    removes the stage's inter-conv HBM round trips (VERDICT r4 #1).
    interpret: Pallas interpreter mode, for CPU-backed tests only."""
    if model.depthwise:
        return model.apply(variables, x)
    params = variables["params"]
    stats = variables["batch_stats"]
    bp, bs = params["backbone"], stats["backbone"]
    bbp, bbs = bp["backbone"], bs["backbone"]

    if s2d_dtype is None:
        s2d_dtype = dtype
    if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != dtype:
        x = x.astype(dtype)

    base_depth = max(round(model.depth * 3), 1)
    n_neck = round(3 * model.depth)

    x = _stem_dark2_s2d(bbp, bbs, x, base_depth, s2d_dtype, dtype,
                        fuse_c3=fuse_c3, interpret=interpret)
    # dark3 stays NHWC: running its C3 in s2d measured 4.2x on the isolated
    # 3x3/s1 convs but a same-process full-model A/B was a wash (within the
    # ±6% relay noise) — the s2d/un_s2d transitions eat the conv gain at
    # this stage's size (PERF_NOTES "YOLOX s2d engine").
    f1 = _csp_block(bbp["dark3"], bbs["dark3"], x, base_depth * 3, False)
    f2 = _csp_block(bbp["dark4"], bbs["dark4"], f1, base_depth * 3, False)
    f3 = _csp_block(bbp["dark5"], bbs["dark5"], f2, base_depth, True)

    fpn_out0 = _base_conv(bp["lateral_conv0"], bs["lateral_conv0"], f3)
    y = jnp.concatenate([_upsample2(fpn_out0), f2], axis=-1)
    f_out0 = _csp_bottleneck(bp["c3_p4"], bs["c3_p4"], y, n_neck, False)

    fpn_out1 = _base_conv(bp["reduce_conv1"], bs["reduce_conv1"], f_out0)
    y = jnp.concatenate([_upsample2(fpn_out1), f1], axis=-1)
    pan_out2 = _csp_bottleneck(bp["c3_p3"], bs["c3_p3"], y, n_neck, False)

    y = _base_conv(bp["bu_conv2"], bs["bu_conv2"], pan_out2, stride=2)
    y = jnp.concatenate([y, fpn_out1], axis=-1)
    pan_out1 = _csp_bottleneck(bp["c3_n3"], bs["c3_n3"], y, n_neck, False)

    y = _base_conv(bp["bu_conv1"], bs["bu_conv1"], pan_out1, stride=2)
    y = jnp.concatenate([y, fpn_out0], axis=-1)
    pan_out0 = _csp_bottleneck(bp["c3_n4"], bs["c3_n4"], y, n_neck, False)

    hp, hs = params["head"], stats["head"]
    outs, shapes = [], []
    for i, feat in enumerate((pan_out2, pan_out1, pan_out0)):
        feat = _base_conv(hp[f"stems_{i}"], hs[f"stems_{i}"], feat)
        cf = _base_conv(hp[f"cls_convs_{i}"]["conv0"],
                        hs[f"cls_convs_{i}"]["conv0"], feat)
        cf = _base_conv(hp[f"cls_convs_{i}"]["conv1"],
                        hs[f"cls_convs_{i}"]["conv1"], cf)
        rf = _base_conv(hp[f"reg_convs_{i}"]["conv0"],
                        hs[f"reg_convs_{i}"]["conv0"], feat)
        rf = _base_conv(hp[f"reg_convs_{i}"]["conv1"],
                        hs[f"reg_convs_{i}"]["conv1"], rf)
        # fused prediction conv: one 1x1 over concat([rf, cf]) emitting
        # [reg4 | obj1 | cls80] directly in output order — exact block
        # rewrite of the three separate preds (reg/obj read rf, cls reads
        # cf), one lane-padded write instead of three + a concat.
        Wr = hp[f"reg_preds_{i}"]["kernel"]
        Wo = hp[f"obj_preds_{i}"]["kernel"]
        Wc = hp[f"cls_preds_{i}"]["kernel"]
        hc = Wr.shape[2]
        K = jnp.zeros((1, 1, 2 * hc, 5 + Wc.shape[3]), Wr.dtype)
        K = K.at[:, :, :hc, 0:4].set(Wr)
        K = K.at[:, :, :hc, 4:5].set(Wo)
        K = K.at[:, :, hc:, 5:].set(Wc)
        bias = jnp.concatenate([hp[f"reg_preds_{i}"]["bias"],
                                hp[f"obj_preds_{i}"]["bias"],
                                hp[f"cls_preds_{i}"]["bias"]])
        out = _conv(jnp.concatenate([rf, cf], axis=-1), K, bias, act=False)
        out = jnp.concatenate(
            [out[..., :4], jax.nn.sigmoid(out[..., 4:])], axis=-1)
        b_, h_, w_, c_ = out.shape
        shapes.append((h_, w_))
        outs.append(out.reshape(b_, h_ * w_, c_))
    out = jnp.concatenate(outs, axis=1).astype(jnp.float32)
    return _decode(out, shapes)


__all__ = ["apply_fast", "s2d", "un_s2d", "s2d_kernel_s1", "s2d_kernel_s2",
           "s2d_kernel_1x1"]
