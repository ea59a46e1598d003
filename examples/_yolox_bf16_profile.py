"""Round-3b YOLOX experiments: per-stage f32 vs bf16-activation profile
(scan-amortized, 16 reps inside one jit) over backbone + pafpn + head,
plus full-model A/B at batch 8.

Run alone (one TPU job at a time):
  python -c "exec(open('examples/_yolox_bf16_profile.py').read())"
"""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import CspBlock, Focus, Yolox

B = 8
REP = 16
model = Yolox.from_variant("tiny")
rng = np.random.default_rng(0)
img_u8 = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.uint8)
variables = model.init(jax.random.PRNGKey(0), img_u8)


def cast_tree(tree, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tree)


def subvars(path, dt=None):
    out = {}
    for col, tree in variables.items():
        node = tree
        for k in path:
            node = node[k]
        out[col] = cast_tree(node, dt) if dt else node
    return out


d, w_, dw = model.depth, model.width, model.depthwise
base_ch = int(round(64 * w_))
base_depth = max(round(d * 3), 1)

STAGES = [
    ("stem/Focus", Focus(base_ch, 3, 1), ("backbone", "backbone", "stem"),
     (B, 640, 640, 3)),
    ("dark2", CspBlock(base_ch * 2, base_depth, False, dw),
     ("backbone", "backbone", "dark2"), (B, 320, 320, base_ch)),
    ("dark3", CspBlock(base_ch * 4, base_depth * 3, False, dw),
     ("backbone", "backbone", "dark3"), (B, 160, 160, base_ch * 2)),
    ("dark4", CspBlock(base_ch * 8, base_depth * 3, False, dw),
     ("backbone", "backbone", "dark4"), (B, 80, 80, base_ch * 4)),
    ("dark5", CspBlock(base_ch * 16, base_depth, True, dw),
     ("backbone", "backbone", "dark5"), (B, 40, 40, base_ch * 8)),
]


def profile(name, module, path, in_shape, dt):
    vs = subvars(path, dt)
    x0 = jnp.asarray(rng.standard_normal(in_shape), dt or jnp.float32)
    if name.startswith("stem"):
        x0 = img_u8  # the real input layout

    @jax.jit
    def run(x0, seed):
        def body(acc, _):
            y = module.apply(vs, x0 + (acc * 1e-30).astype(x0.dtype)
                             if x0.dtype != jnp.uint8 else x0)
            leaf = y[0] if isinstance(y, tuple) else y
            return jnp.mean(leaf.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(x0, s) + 0.0

    dtm = _bench(step, jnp.float32(0.0), iters=8)
    per = dtm / REP
    print(f"{name:12s} {str(dt or 'f32'):10s} {per*1000/B:7.3f} ms/frame "
          f"({per*1000:7.2f} ms/batch)", flush=True)
    return per


for dt in (None, jnp.bfloat16):
    total = 0.0
    for args in STAGES:
        total += profile(*args, dt)
    print(f"{'backbone sum':12s} {str(dt or 'f32'):10s} "
          f"{total*1000/B:7.3f} ms/frame", flush=True)

# ---- full model A/B: f32 vs bf16 params+activations -------------------------
for label, vs, indt in (
    ("full f32", variables, None),
    ("full bf16", cast_tree(variables, jnp.bfloat16), jnp.bfloat16),
):
    if indt is None:
        fwd = jax.jit(lambda im: model.apply(variables, im))
    else:
        vbf = vs

        def fwd(im, vbf=vbf):
            return model.apply(vbf, im)
        fwd = jax.jit(fwd)

    def step(im):
        out = fwd(im)
        return (im.astype(jnp.float32)
                + 0.0 * jnp.mean(out.astype(jnp.float32))).astype(jnp.uint8)

    dtm = _bench(step, img_u8, iters=20)
    print(f"{label:12s} {B/dtm:8.1f} fps  ({dtm*1000:6.2f} ms/batch)",
          flush=True)
