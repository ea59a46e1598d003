"""Separate wrapper vs kernel cost; tune TPL."""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
import gst_plugins_rs_tpu.ops.pallas_colorlut_lowrank as pk
from gst_plugins_rs_tpu.ops.pallas_colorlut_lowrank import pack_factors

S = 33
BATCH, H, W = 8, 1080, 1920
P = BATCH * H * W
rng = np.random.default_rng(0)
rank = 64
U = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
V = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
Wf = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
C = rng.standard_normal((3, rank)).astype(np.float32) * 0.3
ut, vt, wt, c = map(jnp.asarray, pack_factors(U, V, Wf, C))

xyz = jnp.asarray(rng.random((3, P), np.float32) * (S - 1))

for tpl in (1024, 2048, 4096, 8192):
    pk.TPL = tpl
    pk.lowrank_sample_pallas.clear_cache()
    # bare kernel: xyz -> rgb, chained by feeding output back as input
    def step(x, tpl=tpl):
        out = pk.lowrank_sample_pallas(x, ut, vt, wt, c)
        return jnp.clip(out, 0.0, 1.0) * (S - 1.0)  # keep in domain, chainable
    step = jax.jit(step)
    dt = _bench(step, xyz, iters=30)
    print(f"TPL={tpl:5d} bare kernel: {BATCH/dt:8.1f} fps-equivalent", flush=True)
