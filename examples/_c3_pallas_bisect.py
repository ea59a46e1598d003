"""Bisect the Mosaic compile failure of ops/pallas_yolox_c3.py on the relay.

Each candidate feature is exercised in a minimal kernel; run on TPU to see
which construct kills tpu_compile_helper.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, W, C4, Ch = 6400, 80, 192, 96


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out.block_until_ready()
        print(f"{name:28s}: OK {out.shape}")
    except Exception as e:
        msg = str(e).splitlines()[0][:150]
        print(f"{name:28s}: FAIL {type(e).__name__}: {msg}")


# 1. manual DMA ANY->VMEM with grid
def t1(x):
    def k(x_hbm, o_hbm, buf, si, so):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[b], buf, si)
        cp.start(); cp.wait()
        buf[:] = buf[:] * 2.0
        cp2 = pltpu.make_async_copy(buf, o_hbm.at[b], so)
        cp2.start(); cp2.wait()
    return pl.pallas_call(
        k, grid=(x.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((P, C4), x.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


# 2. big matmul in VMEM
def t2(x, w):
    def k(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((P, Ch), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# 3. arbitrary-offset sublane slice of a scratch buffer
def t3(x):
    def k(x_ref, o_ref, tp):
        tp[W + 1:W + 1 + P, :] = x_ref[:]
        tp[0:W + 1, :] = jnp.zeros((W + 1, x_ref.shape[1]), x_ref.dtype)
        tp[W + 1 + P:, :] = jnp.zeros((W + 1, x_ref.shape[1]), x_ref.dtype)
        acc = jnp.zeros_like(x_ref)
        for off in (0, W, W + 1, W + 2, 2 * W + 2):
            acc = acc + tp[off:off + P, :]
        o_ref[:] = acc
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((P, Ch), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), Ch), x.dtype)],
    )(x)


# 4. iota % W mask + where
def t4(x):
    def k(x_ref, o_ref):
        wcol = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
        o_ref[:] = jnp.where(wcol >= 1, x_ref[:], jnp.zeros_like(x_ref))
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((P, Ch), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# 5. static index into stacked weights ref
def t5(x, w):
    def k(x_ref, w_ref, o_ref):
        acc = jnp.zeros((P, Ch), jnp.float32)
        for i in range(w_ref.shape[0]):
            acc = acc + jnp.dot(x_ref[:], w_ref[i],
                                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((P, Ch), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# 6. silu + bias broadcast
def t6(x, b):
    def k(x_ref, b_ref, o_ref):
        o_ref[:] = jax.nn.silu(x_ref[:] + b_ref[:])
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((P, Ch), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, b)


if __name__ == "__main__":
    import numpy as np
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((2, P, C4)), jnp.float32)
    xc = jnp.asarray(rng.standard_normal((P, Ch)), jnp.float32)
    x4 = jnp.asarray(rng.standard_normal((P, C4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C4, Ch)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((9, Ch, Ch)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((Ch, Ch)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, Ch)), jnp.float32)
    print("device:", jax.devices()[0].device_kind)
    run("1 manual DMA grid", t1, xb)
    run("2 matmul", t2, x4, w)
    run("3 offset slices", t3, xc)
    run("4 iota mod mask", t4, xc)
    run("5 stacked weight index", t5, xc, ws)
    run("6 silu bias", t6, xc, bias)
