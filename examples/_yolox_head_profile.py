"""Profile YOLOX pafpn / head / decode / upsample separately (scan-amortized).

Run: python -c "exec(open('examples/_yolox_head_profile.py').read())"
"""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import (
    Head, Pafpn, Yolox, _decode, _upsample2)

B = 8
REP = 16
model = Yolox.from_variant("tiny")
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
variables = model.init(jax.random.PRNGKey(0), img)

d, w_, dw = model.depth, model.width, model.depthwise
bc = int(round(64 * w_))
feats = [jnp.asarray(rng.standard_normal((B, 80, 80, bc * 4)), jnp.float32),
         jnp.asarray(rng.standard_normal((B, 40, 40, bc * 8)), jnp.float32),
         jnp.asarray(rng.standard_normal((B, 20, 20, bc * 16)), jnp.float32)]


def subvars(path):
    out = {}
    for col, tree in variables.items():
        node = tree
        for k in path:
            node = node[k]
        out[col] = node
    return out


def prof(name, fn, args, iters=8):
    @jax.jit
    def run(seed, *args):
        def body(acc, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: a + (acc * 1e-30).astype(a.dtype), args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.mean(leaf.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(s, *args) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters) / REP
    print(f"{name:16s} {dt*1000/B:7.3f} ms/frame ({dt*1000:7.2f} ms/batch)",
          flush=True)


pafpn = Pafpn(d, w_, dw)
pvars = subvars(("backbone",))
prof("pafpn", lambda *f: pafpn.apply(pvars, f), tuple(feats))

# pafpn outputs (same shapes as feats for tiny: 96/192/384 at 80/40/20)
head = Head(80, w_, dw)
hvars = subvars(("head",))
prof("head+decode", lambda *f: head.apply(hvars, f), tuple(feats))

# decode alone
hidden = [f.shape for f in feats]
raw = jnp.asarray(rng.standard_normal((B, 80 * 80 + 40 * 40 + 20 * 20, 85)),
                  jnp.float32)
prof("decode", lambda r: _decode(r, [(80, 80), (40, 40), (20, 20)]), (raw,))

# upsample alone
prof("upsample 40->80", lambda x: _upsample2(x), (feats[1][:, :40, :40, :],))

# head WITHOUT decode (raw level outputs, no reshape/concat)
class HeadNoDecode(Head):
    def __call__(self, features):
        import flax.linen as nn
        import math
        hidden = int(80 * 0 + 256 * self.width)
        from gst_plugins_rs_tpu.models.yolox import (
            BaseConv, ConvBlock, PRIOR_PROB)
        bias_init = nn.initializers.constant(
            -math.log((1.0 - PRIOR_PROB) / PRIOR_PROB))
        outs = []
        for i, feat in enumerate(features):
            feat = BaseConv(hidden, 1, 1, name=f"stems_{i}")(feat)
            cls_feat = ConvBlock(hidden, self.depthwise, name=f"cls_convs_{i}")(feat)
            cls_out = nn.Conv(self.num_classes, (1, 1), bias_init=bias_init,
                              name=f"cls_preds_{i}")(cls_feat)
            reg_feat = ConvBlock(hidden, self.depthwise, name=f"reg_convs_{i}")(feat)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_preds_{i}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1), bias_init=bias_init,
                              name=f"obj_preds_{i}")(reg_feat)
            outs.append((reg_out, obj_out, cls_out))
        return outs


HeadNoDecode.__call__ = __import__("flax").linen.compact(HeadNoDecode.__call__)
hnd = HeadNoDecode(80, w_, dw)
prof("head raw convs", lambda *f: hnd.apply(hvars, f), tuple(feats))
