"""Serving-scale experiment: StreamBank aggregate throughput vs bank size.

How far does batching concurrent streams into one dispatch scale on a
single chip?  Measures the rnnoise vmapped bank and the loudnormbank
device path at bank sizes 1..256 (the multi-tenant serving shape); the
knee tells deployments how many streams to pack per chip.  Results go
into PERF_NOTES.md's bank-scaling table.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _bench  # noqa: E402 (chained-dep differential timer)


def rnnoise_curve():
    from gst_plugins_rs_tpu.ops import rnnoise as RN

    rn_weights = {k: jnp.asarray(v) for k, v in RN.default_weights().items()}
    K = 16  # frames per dispatch
    rng = np.random.default_rng(0)
    for bank in (1, 4, 16, 64, 256):
        scan = jax.jit(jax.vmap(
            lambda s, fr: RN.denoise_frames_fast(s, rn_weights, fr),
            in_axes=(0, 0)))
        state = jax.vmap(lambda _: RN.denoise_init(1))(jnp.arange(bank))
        frames = jnp.asarray(
            rng.uniform(-0.3, 0.3, (bank, K, 1, RN.FRAME_SIZE)).astype(np.float32) * 32767)

        def step(s):
            s2, outs, vads = scan(s, frames)
            return s2

        dt = _bench(step, state, iters=10)
        agg = bank * (K * RN.FRAME_SIZE / 48000) / dt
        print(f"rnnoise  bank={bank:4d}: {agg:9.0f}x aggregate "
              f"({agg/bank:7.1f}x per stream, {dt*1e3:.2f} ms/dispatch)")


def loudnorm_curve():
    from gst_plugins_rs_tpu.parallel.streams import loudnorm_bank

    rng = np.random.default_rng(1)
    for bank in (4, 16, 64, 256):
        lb = loudnorm_bank(bank, channels=2, dtype=jnp.float32)
        first3 = jnp.asarray(rng.uniform(-0.4, 0.4, (bank, 3 * 19200, 2)).astype(np.float32))
        lb.first_frame(first3)
        frame = jnp.asarray(rng.uniform(-0.4, 0.4, (bank, 19200, 2)).astype(np.float32))

        def step(states):
            lb.states = states
            lb.process(frame)
            return lb.states

        dt = _bench(step, lb.states, iters=20)
        agg = bank * 0.1 / dt
        print(f"loudnorm bank={bank:4d}: {agg:9.0f}x aggregate "
              f"({agg/bank:7.1f}x per stream, {dt*1e3:.2f} ms/dispatch)")


if __name__ == "__main__":
    t0 = time.time()
    rnnoise_curve()
    loudnorm_curve()
    print(f"total {time.time()-t0:.0f}s", file=sys.stderr)
