"""YOLOX object-detection model (flax.linen, NHWC, inference).

Parity target: analytics/burn/src/yoloxinference/yolox_burn/model/*
(yolox.rs:18-28 Yolox = Pafpn(CspDarknet) + Head; darknet.rs Focus/CSP/SPP
blocks; pafpn.rs up/down feature pyramid; head.rs decoupled head with sigmoid
obj/cls and grid/stride decode, strides [8,16,32]).  Variants via
width/depth multipliers (yolox.rs:40-222): nano(0.33,0.25,dw) tiny(0.33,0.375)
s(0.33,0.5) m(0.67,0.75) l(1.0,1.0) x(1.33,1.25).

Weight import: load_torch_weights() maps an official YOLOX PyTorch
state_dict (top-level "model" key) into the flax tree using the same key
remappings as the reference loader (yolox.rs:246-277), transposing conv
kernels OIHW->HWIO.
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

STRIDES = (8, 16, 32)
PRIOR_PROB = 1e-2

VARIANTS = {
    "nano": (0.33, 0.25, True),
    "tiny": (0.33, 0.375, False),
    "s": (0.33, 0.50, False),
    "m": (0.67, 0.75, False),
    "l": (1.0, 1.0, False),
    "x": (1.33, 1.25, False),
}


def expand(c: int, factor: float) -> int:
    return int(math.floor(c * factor))


class BaseConv(nn.Module):
    out_ch: int
    k: int
    stride: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(
            self.out_ch,
            (self.k, self.k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.97, name="bn")(x)
        return nn.silu(x)


class DwsConv(nn.Module):
    out_ch: int
    k: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = BaseConv(in_ch, self.k, self.stride, groups=in_ch, name="dconv")(x)
        return BaseConv(self.out_ch, 1, 1, name="pconv")(x)


def ConvSel(out_ch, k, stride, depthwise, name):
    return DwsConv(out_ch, k, stride, name=name) if depthwise else BaseConv(out_ch, k, stride, name=name)


class Focus(nn.Module):
    out_ch: int
    k: int
    stride: int

    @nn.compact
    def __call__(self, x):
        # NHWC space-to-depth via reshape/transpose; channel order matches
        # the reference cat: top_left, bottom_left, top_right, bottom_right
        # (blocks.rs:196-205).  The reshape form measured 1.27x faster than
        # four strided slices + concat on v5e, and 6.5x when the input
        # arrives as u8 and is cast in-jit (PERF_NOTES.md round-3 YOLOX) —
        # the [B,H,W,3] f32 layout lane-pads 3 -> 128 and dominates the
        # whole model otherwise.
        b, h, w, c = x.shape
        # dims (b, h2, hb, w2, wb, c) -> (b, h2, w2, wb, hb, c): flattening
        # wb-major/hb-minor IS the reference cat order (top_left, bottom_left,
        # top_right, bottom_right) — a pure transpose, no channel gather
        # (bit-equal to the old reshape+perm form, verified).
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 4, 2, 5).reshape(b, h // 2, w // 2, 4 * c)
        return BaseConv(self.out_ch, self.k, self.stride, name="conv")(y)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        y = BaseConv(self.out_ch, 1, 1, name="conv1")(x)
        y = ConvSel(self.out_ch, 3, 1, self.depthwise, name="conv2")(y)
        return x + y if self.shortcut else y


class CspBottleneck(nn.Module):
    """C3: 2-branch cross-stage partial block (bottleneck.rs:137-205)."""

    out_ch: int
    n: int
    expansion: float
    shortcut: bool
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        hidden = expand(self.out_ch, self.expansion)
        x1 = BaseConv(hidden, 1, 1, name="conv1")(x)
        x2 = BaseConv(hidden, 1, 1, name="conv2")(x)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, self.depthwise, name=f"m_{i}")(x1)
        return BaseConv(self.out_ch, 1, 1, name="conv3")(jnp.concatenate([x1, x2], axis=-1))


class SppBottleneck(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, name="conv1")(x)
        pools = [x]
        for k in (5, 9, 13):
            pad = k // 2
            pools.append(
                nn.max_pool(x, (k, k), strides=(1, 1), padding=[(pad, pad), (pad, pad)])
            )
        return BaseConv(self.out_ch, 1, 1, name="conv2")(jnp.concatenate(pools, axis=-1))


class CspBlock(nn.Module):
    out_ch: int
    n: int
    spp: bool
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        x = ConvSel(self.out_ch, 3, 2, self.depthwise, name="conv")(x)
        if self.spp:
            x = SppBottleneck(self.out_ch, name="spp")(x)
        return CspBottleneck(self.out_ch, self.n, 0.5, not self.spp, self.depthwise, name="c3")(x)


class CspDarknet(nn.Module):
    depth: float
    width: float
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        base_ch = expand(64, self.width)
        base_depth = max(round(self.depth * 3), 1)
        x = Focus(base_ch, 3, 1, name="stem")(x)
        x = CspBlock(base_ch * 2, base_depth, False, self.depthwise, name="dark2")(x)
        f1 = CspBlock(base_ch * 4, base_depth * 3, False, self.depthwise, name="dark3")(x)
        f2 = CspBlock(base_ch * 8, base_depth * 3, False, self.depthwise, name="dark4")(f1)
        f3 = CspBlock(base_ch * 16, base_depth, True, self.depthwise, name="dark5")(f2)
        return f1, f2, f3


def _upsample2(x):
    # nearest 2x via broadcast (bit-equal to jax.image.resize nearest,
    # verified) — resize lowers to gathers, which issue ~1 row/5 cycles on
    # this TPU (PERF_NOTES colorlut analysis); the broadcast form is a copy.
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, h * 2, w * 2, c)


class Pafpn(nn.Module):
    depth: float
    width: float
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        w = self.width
        in_ch = [expand(256, w), expand(512, w), expand(1024, w)]
        n = round(3 * self.depth)
        f1, f2, f3 = CspDarknet(self.depth, w, self.depthwise, name="backbone")(x)

        fpn_out0 = BaseConv(in_ch[1], 1, 1, name="lateral_conv0")(f3)
        y = jnp.concatenate([_upsample2(fpn_out0), f2], axis=-1)
        f_out0 = CspBottleneck(in_ch[1], n, 0.5, False, self.depthwise, name="c3_p4")(y)

        fpn_out1 = BaseConv(in_ch[0], 1, 1, name="reduce_conv1")(f_out0)
        y = jnp.concatenate([_upsample2(fpn_out1), f1], axis=-1)
        pan_out2 = CspBottleneck(in_ch[0], n, 0.5, False, self.depthwise, name="c3_p3")(y)

        y = ConvSel(in_ch[0], 3, 2, self.depthwise, name="bu_conv2")(pan_out2)
        y = jnp.concatenate([y, fpn_out1], axis=-1)
        pan_out1 = CspBottleneck(in_ch[1], n, 0.5, False, self.depthwise, name="c3_n3")(y)

        y = ConvSel(in_ch[1], 3, 2, self.depthwise, name="bu_conv1")(pan_out1)
        y = jnp.concatenate([y, fpn_out0], axis=-1)
        pan_out0 = CspBottleneck(in_ch[2], n, 0.5, False, self.depthwise, name="c3_n4")(y)

        return pan_out2, pan_out1, pan_out0


class ConvBlock(nn.Module):
    ch: int
    depthwise: bool

    @nn.compact
    def __call__(self, x):
        x = ConvSel(self.ch, 3, 1, self.depthwise, name="conv0")(x)
        return ConvSel(self.ch, 3, 1, self.depthwise, name="conv1")(x)


class Head(nn.Module):
    num_classes: int
    width: float
    depthwise: bool

    @nn.compact
    def __call__(self, features):
        hidden = expand(256, self.width)
        bias_init = nn.initializers.constant(-math.log((1.0 - PRIOR_PROB) / PRIOR_PROB))
        outs = []
        shapes = []
        for i, feat in enumerate(features):
            feat = BaseConv(hidden, 1, 1, name=f"stems_{i}")(feat)
            cls_feat = ConvBlock(hidden, self.depthwise, name=f"cls_convs_{i}")(feat)
            cls_out = nn.Conv(self.num_classes, (1, 1), bias_init=bias_init, name=f"cls_preds_{i}")(cls_feat)
            reg_feat = ConvBlock(hidden, self.depthwise, name=f"reg_convs_{i}")(feat)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_preds_{i}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1), bias_init=bias_init, name=f"obj_preds_{i}")(reg_feat)
            out = jnp.concatenate(
                [reg_out, jax.nn.sigmoid(obj_out), jax.nn.sigmoid(cls_out)], axis=-1
            )
            b, h, w_, c = out.shape
            shapes.append((h, w_))
            outs.append(out.reshape(b, h * w_, c))
        out = jnp.concatenate(outs, axis=1)  # [B, anchors, 5+classes]
        return _decode(out, shapes)


def _decode(out, shapes: Sequence[Tuple[int, int]]):
    """Grid/stride decode (head.rs:89-122): xy=(pred+grid)*stride,
    wh=exp(pred)*stride."""
    grids = []
    strides = []
    for (h, w), s in zip(shapes, STRIDES):
        gy, gx = jnp.mgrid[0:h, 0:w]
        grid = jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 2).astype(out.dtype)
        grids.append(grid)
        strides.append(jnp.full((1, h * w, 1), s, out.dtype))
    grid = jnp.concatenate(grids, axis=1)
    stride = jnp.concatenate(strides, axis=1)
    return jnp.concatenate(
        [
            (out[..., 0:2] + grid) * stride,
            jnp.exp(out[..., 2:4]) * stride,
            out[..., 4:],
        ],
        axis=-1,
    )


class Yolox(nn.Module):
    num_classes: int = 80
    depth: float = 0.33
    width: float = 0.50
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        # accept u8 frames directly: casting INSIDE the jit keeps the
        # [B,H,W,3] tensor in HBM as 3-byte pixels instead of a lane-padded
        # f32 layout — measured 6.5x on the stem (PERF_NOTES round 3).
        # float inputs (f32/bf16) pass through at their own precision.
        if not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.float32)
        features = Pafpn(self.depth, self.width, self.depthwise, name="backbone")(x)
        return Head(self.num_classes, self.width, self.depthwise, name="head")(features)

    @staticmethod
    def from_variant(variant: str, num_classes: int = 80) -> "Yolox":
        depth, width, dw = VARIANTS[variant]
        return Yolox(num_classes=num_classes, depth=depth, width=width, depthwise=dw)


def init_variables(model: Yolox, image_size: int = 640, seed: int = 0):
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)


# ---------------------------------------------------------------------------
# Torch state_dict import (reference remapping, yolox.rs:246-277)
# ---------------------------------------------------------------------------
_REMAPS = [
    (re.compile(r"^backbone\.C3_(.+)"), r"backbone.c3_\1"),
    (re.compile(r"^(backbone\.backbone\.dark[2-5])\.0\.(.+)"), r"\1.conv.\2"),
    (re.compile(r"^(backbone\.backbone\.dark[2-4])\.1\.(.+)"), r"\1.c3.\2"),
    (re.compile(r"^(backbone\.backbone\.dark5)\.1\.(.+)"), r"\1.spp.\2"),
    (re.compile(r"^(backbone\.backbone\.dark5)\.2\.(.+)"), r"\1.c3.\2"),
    (re.compile(r"^(head\.(?:cls|reg)_convs\.[0-9]+)\.([0-9]+)\.(.+)"), r"\1.conv\2.\3"),
]


def _remap_key(key: str) -> str:
    for pat, rep in _REMAPS:
        key = pat.sub(rep, key)
    return key


def load_torch_weights(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load an official YOLOX .pth checkpoint into flax variables.

    The checkpoint's "model" dict is remapped with the reference's regexes,
    then each tensor is placed into the flax tree: conv `weight` OIHW->HWIO
    (depthwise O1HW->HW1O), batchnorm weight/bias/running_mean/running_var ->
    scale/bias/mean/var."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]

    import flax

    flat_params = dict(flax.traverse_util.flatten_dict(variables["params"]))
    flat_stats = dict(flax.traverse_util.flatten_dict(variables["batch_stats"]))

    def put(tree, path_t, value, expect_shape):
        if value.shape != expect_shape:
            raise ValueError(f"shape mismatch at {path_t}: {value.shape} vs {expect_shape}")
        tree[path_t] = jnp.asarray(value)

    for key, tensor in sd.items():
        key = _remap_key(key)
        parts = key.split(".")
        leaf = parts[-1]
        # module path -> flax path: list indices fold into names
        # (stems.0 -> stems_0, m.0 -> m_0, cls_convs.0 -> cls_convs_0)
        mod: List[str] = []
        i = 0
        body = parts[:-1]
        while i < len(body):
            p = body[i]
            if i + 1 < len(body) and body[i + 1].isdigit():
                mod.append(f"{p}_{body[i + 1]}")
                i += 2
            else:
                mod.append(p)
                i += 1
        arr = tensor.detach().numpy()
        if leaf == "weight" and arr.ndim == 4:
            o, i_, kh, kw = arr.shape
            if i_ == 1 and mod[-1] == "dconv":  # depthwise O1HW -> HW1O
                arr = arr.transpose(2, 3, 1, 0)
            else:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            pt = tuple(mod) + ("kernel",)
            put(flat_params, pt, arr, flat_params[pt].shape)
        elif leaf == "weight":  # batchnorm gamma
            pt = tuple(mod) + ("scale",)
            put(flat_params, pt, arr, flat_params[pt].shape)
        elif leaf == "bias":
            pt = tuple(mod) + ("bias",)
            put(flat_params, pt, arr, flat_params[pt].shape)
        elif leaf == "running_mean":
            pt = tuple(mod) + ("mean",)
            put(flat_stats, pt, arr, flat_stats[pt].shape)
        elif leaf == "running_var":
            pt = tuple(mod) + ("var",)
            put(flat_stats, pt, arr, flat_stats[pt].shape)
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise KeyError(f"unhandled torch key {key}")

    return {
        "params": flax.traverse_util.unflatten_dict(flat_params),
        "batch_stats": flax.traverse_util.unflatten_dict(flat_stats),
    }


__all__ = ["Yolox", "VARIANTS", "init_variables", "load_torch_weights", "STRIDES"]
