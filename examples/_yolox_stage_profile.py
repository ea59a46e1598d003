"""Scan-amortized per-stage YOLOX profile: each stage repeated 16x INSIDE
one jit, so the relay's ~0.5 ms per-dispatch fixed cost amortizes away.

Run: python -c "exec(open('examples/_yolox_stage_profile.py').read())"
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
img = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3)), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), img)


def subvars(path):
    out = {}
    for col, tree in variables.items():
        node = tree
        for k in path:
            node = node[k]
        out[col] = node
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


def profile(name, module, path, in_shape):
    vs = subvars(path)
    x0 = jnp.asarray(rng.standard_normal(in_shape), jnp.float32)

    @jax.jit
    def run(x0, seed):
        def body(acc, _):
            y = module.apply(vs, x0 + acc * 1e-30)
            leaf = y[0] if isinstance(y, tuple) else y
            return jnp.mean(leaf), None
        acc, _ = jax.lax.scan(body, seed, None, length=REP)
        return acc

    def step(s):
        return run(x0, s) + 0.0

    dt = _bench(step, jnp.float32(0.0), iters=8)
    per = dt / REP
    print(f"{name:12s} {per*1000/B:7.3f} ms/frame ({per*1000:7.2f} ms/batch)",
          flush=True)
    return per


total = 0.0
for args in STAGES:
    total += profile(*args)
print(f"{'backbone sum':12s} {total*1000/B:7.3f} ms/frame", flush=True)
