"""TPU throughput: lowrank CP colorlut vs packed-gather baseline.

Run from repo root: python -c "exec(open('examples/_lowrank_tpu_bench.py').read())"
Uses bench.py's chained differential timing (relay-safe).
"""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.ops.colorlut import (
    lut3d_apply_packed, pack_corner_table)
from gst_plugins_rs_tpu.ops.colorlut_lowrank import lut3d_apply_lowrank

S = 33
BATCH, H, W = 8, 1080, 1920
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 4), dtype=np.uint8))
scale = jnp.ones(3); offset = jnp.zeros(3)

table = rng.random((S**3, 3)).astype(np.float32)
packed = jnp.asarray(pack_corner_table(table, S))

step = jax.jit(lambda f: lut3d_apply_packed(
    f, packed, scale, offset, size=S, offsets=(0, 1, 2), bits=8))
dt = _bench(step, frames, iters=30)
print(f"packed-gather baseline: {BATCH/dt:8.1f} fps", flush=True)

for rank in (16, 32, 64, 128):
    U = jnp.asarray(rng.standard_normal((S, rank)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((S, rank)).astype(np.float32))
    Wf = jnp.asarray(rng.standard_normal((S, rank)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((3, rank)).astype(np.float32))
    for cdt in ("bfloat16", "float32"):
        step = jax.jit(lambda f, U=U, V=V, Wf=Wf, C=C, cdt=cdt:
                       lut3d_apply_lowrank(
                           f, U, V, Wf, C, scale, offset, size=S,
                           offsets=(0, 1, 2), bits=8, compute_dtype=cdt))
        dt = _bench(step, frames, iters=30)
        print(f"lowrank rank={rank:3d} {cdt:9s}: {BATCH/dt:8.1f} fps", flush=True)
