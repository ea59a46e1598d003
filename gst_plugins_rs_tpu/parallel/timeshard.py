"""Sequence parallelism: shard a long stream's TIME axis across the mesh.

SURVEY.md §2.3/§5: the reference's "long context" is unbounded streaming
time handled by windowed state; the TPU-native scale-out for one very long
stream is to shard the time axis across chips and exchange halos over ICI
for the window/lookahead overlaps (FIR taps, limiter lookahead).

`sharded_fir` runs an FIR convolution (the hrtf/sofalizer kernel class) over
a time-sharded signal with a ppermute halo exchange: every shard fetches the
previous shard's (taps-1)-sample tail, so the result is bit-identical to the
unsharded convolution while each chip only touches its local slice.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_fir(x, h, mesh: Mesh, axis: str = "time"):
    """Causal FIR of a time-sharded signal with ICI halo exchange.

    x: [N] (N divisible by mesh size), h: [T] taps.  Returns y[n] =
    sum_k h[k] * x[n-k] (zeros before the stream start), sharded like x."""
    T = int(h.shape[0])
    n_shards = mesh.shape[axis]

    def kernel(x_local, h_arr):
        # fetch the previous shard's tail as our left halo (zeros for shard 0)
        idx = jax.lax.axis_index(axis)
        tail = x_local[-(T - 1) :] if T > 1 else x_local[:0]
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        halo = jax.lax.ppermute(tail, axis, perm)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, x_local])  # [(T-1) + local]
        y = jnp.convolve(ext, h_arr, mode="full")[T - 1 : T - 1 + x_local.shape[0]]
        return y

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    return fn(x, h)


def sharded_block_loudness(x, mesh: Mesh, n100: int, axis: str = "time"):
    """Per-100ms-subblock energies of ONE long mono stream, time-sharded.

    Returns [N // n100] energy sums; with the time axis sharded the subblock
    reduction is embarrassingly parallel per shard (shards must hold whole
    subblocks: N/devices divisible by n100)."""

    def kernel(x_local):
        B = x_local.shape[0] // n100
        return jnp.sum((x_local * x_local).reshape(B, n100), axis=1)

    fn = shard_map(kernel, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))
    return fn(x)


__all__ = ["sharded_fir", "sharded_block_loudness"]
