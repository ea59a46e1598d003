"""Per-stage YOLOX timing on TPU: backbone vs neck vs head.

Run: python -c "exec(open('examples/_yolox_profile.py').read())"
"""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.models.yolox import CspDarknet, Pafpn, Yolox

B = 8
model = Yolox.from_variant("tiny")
print("variant tiny: depth", model.depth, "width", model.width, flush=True)
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


backbone = CspDarknet(model.depth, model.width, model.depthwise)
bb_vars = subvars(("backbone", "backbone"))
neck = Pafpn(model.depth, model.width, model.depthwise)
nk_vars = subvars(("backbone",))

fwd_bb = jax.jit(lambda im: backbone.apply(bb_vars, im))
fwd_nk = jax.jit(lambda im: neck.apply(nk_vars, im))
fwd_full = jax.jit(lambda im: model.apply(variables, im))


def chain(fwd):
    def step(im):
        out = fwd(im)
        leaf = out[0] if isinstance(out, tuple) else out
        return im + 0.0 * jnp.mean(leaf)
    return step


for name, fwd in (("backbone", fwd_bb), ("backbone+neck", fwd_nk),
                  ("full", fwd_full)):
    dt = _bench(chain(fwd), img, iters=20)
    print(f"{name:15s}: {dt*1000/B:7.3f} ms/frame  {B/dt:7.1f} fps", flush=True)
