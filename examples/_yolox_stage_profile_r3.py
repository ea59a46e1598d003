"""Round-3 follow-up YOLOX profile: full model + backbone stages + neck +
head (+decode) with the shipped u8 stem, f32 vs bf16 params/activations.

Scan-amortized (REP repeats inside one jit) like _yolox_stage_profile.py,
so the relay's per-dispatch fixed cost amortizes away.

Run (alone — never concurrent with another TPU job):
    python examples/_yolox_stage_profile_r3.py
"""
import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _bench
from gst_plugins_rs_tpu.models.yolox import CspBlock, Focus, Head, Pafpn, Yolox

B = 8
REP = 16
model = Yolox.from_variant("tiny")
rng = np.random.default_rng(0)
img_u8 = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
variables = model.init(jax.random.PRNGKey(0), img_u8)


def subvars(path, vs=None):
    out = {}
    for col, tree in (vs or variables).items():
        node = tree
        for k in path:
            node = node[k]
        out[col] = node
    return out


def bf16_vars(vs):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vs)


d, w_, dw = model.depth, model.width, model.depthwise
base_ch = int(round(64 * w_))          # 24 for tiny
base_depth = max(round(d * 3), 1)
in_ch = [int(256 * w_), int(512 * w_), int(1024 * w_)]  # 96/192/384


def profile(name, module, vs, in_spec, iters=8, cast=None):
    """in_spec: shape tuple, or list of (shape, dtype) for multi-input.
    cast: dtype to cast u8 inputs to INSIDE the jit (mirrors the shipped
    element's in-jit cast); None leaves u8 for modules that cast themselves."""
    if isinstance(in_spec, tuple):
        in_spec = [(in_spec, jnp.float32)]
    xs = []
    for shape, dtype in in_spec:
        if dtype == jnp.uint8:
            xs.append(jnp.asarray(rng.integers(0, 256, shape), jnp.uint8))
        else:
            xs.append(jnp.asarray(rng.standard_normal(shape), dtype))
    xs = tuple(xs)

    @jax.jit
    def run(xs, seed):
        def body(acc, _):
            perturbed = []
            for x in xs:
                if x.dtype == jnp.uint8:
                    if cast is not None:
                        x = x.astype(cast) + acc.astype(cast) * 1e-30
                else:
                    x = x + acc.astype(x.dtype) * 1e-30
                perturbed.append(x)
            arg = perturbed[0] if len(perturbed) == 1 else tuple(perturbed)
            y = module.apply(vs, arg)
            leaf = y[0] if isinstance(y, tuple) else y
            return jnp.mean(leaf).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(xs, s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=iters)
    per = dt / REP
    print(f"{name:22s} {per*1000/B:7.3f} ms/frame ({B/per:7.1f} fps)",
          flush=True)
    return per


# ---- full model, f32 vs bf16 params+activations ---------------------------
# cast u8 -> float INSIDE the profile jit (same as the model's own in-jit
# cast; needed so the scan body depends on the carry and can't be hoisted)
profile("FULL u8/f32", model, variables, [((B, 640, 640, 3), jnp.uint8)],
        cast=jnp.float32)
vb = bf16_vars(variables)


class YoloxBf16(Yolox):
    @nn.compact
    def __call__(self, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.bfloat16)
        features = Pafpn(self.depth, self.width, self.depthwise,
                         name="backbone")(x)
        return Head(self.num_classes, self.width, self.depthwise,
                    name="head")(features)


mb = YoloxBf16(num_classes=80, depth=d, width=w_, depthwise=dw)
profile("FULL u8/bf16", mb, vb, [((B, 640, 640, 3), jnp.uint8)],
        cast=jnp.bfloat16)

# ---- stages (f32) ----------------------------------------------------------
stages = [
    ("stem/Focus u8", Focus(base_ch, 3, 1), ("backbone", "backbone", "stem"),
     [((B, 640, 640, 3), jnp.uint8)]),
    ("dark2", CspBlock(base_ch * 2, base_depth, False, dw),
     ("backbone", "backbone", "dark2"), (B, 320, 320, base_ch)),
    ("dark3", CspBlock(base_ch * 4, base_depth * 3, False, dw),
     ("backbone", "backbone", "dark3"), (B, 160, 160, base_ch * 2)),
    ("dark4", CspBlock(base_ch * 8, base_depth * 3, False, dw),
     ("backbone", "backbone", "dark4"), (B, 80, 80, base_ch * 4)),
    ("dark5", CspBlock(base_ch * 16, base_depth, True, dw),
     ("backbone", "backbone", "dark5"), (B, 40, 40, base_ch * 8)),
]
tot = 0.0
for name, mod, path, spec in stages:
    tot += profile(name, mod, subvars(path), spec,
                   cast=jnp.float32 if isinstance(spec, list) else None)
print(f"{'backbone sum':22s} {tot*1000/B:7.3f} ms/frame", flush=True)

# ---- neck (full pafpn minus backbone-sum) and head -------------------------
pafpn = Pafpn(d, w_, dw)
tp = profile("pafpn(all) u8", pafpn, subvars(("backbone",)),
             [((B, 640, 640, 3), jnp.uint8)], cast=jnp.float32)
print(f"{'neck (pafpn-bb)':22s} {(tp-tot)*1000/B:7.3f} ms/frame", flush=True)

head = Head(80, w_, dw)
feat_spec = [((B, 80, 80, in_ch[0]), jnp.float32),
             ((B, 40, 40, in_ch[1]), jnp.float32),
             ((B, 20, 20, in_ch[2]), jnp.float32)]
profile("head+decode", head, subvars(("head",)), feat_spec)

# ---- bf16 stages for the top costs ----------------------------------------
for name, mod, path, spec in stages[1:4]:
    profile(name + " bf16", mod, subvars(path, vb), [(spec, jnp.bfloat16)])
