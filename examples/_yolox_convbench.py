"""Per-conv microbenchmarks for the YOLOX-tiny hot shapes on TPU."""
import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench

B = 8
SHAPES = [
    # (name, in (H,W,Ci), rhs (kh,kw,Ci,Co), stride)
    ("stem 3x3/1 12->24@320", (320, 320, 12), (3, 3, 12, 24), 1),
    ("dark2 3x3/2 24->48", (320, 320, 24), (3, 3, 24, 48), 2),
    ("dark2 1x1 48->24", (160, 160, 48), (1, 1, 48, 24), 1),
    ("dark3 3x3/2 48->96", (160, 160, 48), (3, 3, 48, 96), 2),
    ("dark3 3x3 96->96@80", (80, 80, 96), (3, 3, 96, 96), 1),
    ("dark5 3x3 192->384@20", (40, 40, 192), (3, 3, 192, 384), 2),
]
rng = np.random.default_rng(0)

for dtype in (jnp.float32,):
    print(f"--- {dtype.__name__}", flush=True)
    for name, (h, w, ci), rhs, stride in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, h, w, ci)), dtype)
        k = jnp.asarray(rng.standard_normal(rhs) * 0.05, dtype)
        pad = (rhs[0] - 1) // 2

        @jax.jit
        def step(xx, k=k, stride=stride, pad=pad, ci=ci):
            y = jax.lax.conv_general_dilated(
                xx, k, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # chain: project back to input shape cheaply
            return xx + 0.0 * jnp.mean(y)

        dt = _bench(step, x, iters=12)
        ho, wo = h // stride, w // stride
        gf = 2.0 * B * ho * wo * rhs[0] * rhs[1] * ci * rhs[3] / 1e9
        print(f"{name:24s} {dt*1000:7.3f} ms  {gf/dt/1000:6.2f} TF/s", flush=True)
