"""Correctness + throughput of the fused Pallas lowrank colorlut kernel.

Run from repo root: python -c "exec(open('examples/_lowrank_pallas_bench.py').read())"
"""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench
from gst_plugins_rs_tpu.ops.colorlut_lowrank import lut3d_apply_lowrank
from gst_plugins_rs_tpu.ops.pallas_colorlut_lowrank import (
    lut3d_apply_lowrank_fused, pack_factors)

S = 33
BATCH, H, W = 8, 1080, 1920
rng = np.random.default_rng(0)
scale = jnp.ones(3); offset = jnp.zeros(3)

for rank in (16, 32, 64, 128):
    U = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
    V = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
    Wf = rng.standard_normal((S, rank)).astype(np.float32) * 0.3
    C = rng.standard_normal((3, rank)).astype(np.float32) * 0.3
    ut, vt, wt, c = map(jnp.asarray, pack_factors(U, V, Wf, C))
    Uj, Vj, Wj, Cj = map(jnp.asarray, (U, V, Wf, C))

    # correctness vs the XLA lowrank on a small frame, f32 compute
    small = jnp.asarray(rng.integers(0, 256, (2, 64, 128, 4), dtype=np.uint8))
    ref = lut3d_apply_lowrank(small, Uj, Vj, Wj, Cj, scale, offset, size=S,
                              offsets=(0, 1, 2), bits=8,
                              compute_dtype="float32")
    got = lut3d_apply_lowrank_fused(small, ut, vt, wt, c, scale, offset,
                                    size=S, offsets=(0, 1, 2), bits=8,
                                    compute_dtype="float32")
    diff = int(jnp.max(jnp.abs(ref.astype(jnp.int32) - got.astype(jnp.int32))))
    print(f"rank={rank:3d} correctness vs XLA-f32: max {diff} LSB", flush=True)

    frames = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 4), dtype=np.uint8))
    for cdt in ("bfloat16", "float32"):
        step = jax.jit(lambda f, ut=ut, vt=vt, wt=wt, c=c, cdt=cdt:
                       lut3d_apply_lowrank_fused(
                           f, ut, vt, wt, c, scale, offset, size=S,
                           offsets=(0, 1, 2), bits=8, compute_dtype=cdt))
        dt = _bench(step, frames, iters=30)
        print(f"rank={rank:3d} pallas {cdt:9s}: {BATCH/dt:8.1f} fps", flush=True)
