"""Multi-stream batching: many independent streams per device dispatch.

The TPU-native analog of the reference's threadshare runtime
(generic/threadshare/src/runtime/ — "many elements, few threads",
runtime/mod.rs:9-49) and of analyticscombiner's batch-across-streams strategy
(SURVEY.md §2.3): instead of amortizing OS wakeups across hundreds of
streams, a StreamBank amortizes *device dispatches* — N streams' element
state rides a leading batch axis, one vmapped jit processes a buffer for
every stream at once, and a jax.sharding.Mesh spreads the stream axis over
chips (collectives ride ICI).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stream_mesh(n_devices: Optional[int] = None, axis: str = "stream") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


class StreamBank:
    """N parallel instances of a pure streaming step, one dispatch per tick.

    step_fn: (state, x) -> (state, y) for ONE stream.
    init_state: per-stream initial state pytree (replicated to N streams).
    With a mesh, the stream axis of both state and data is sharded over it.
    """

    def __init__(
        self,
        step_fn: Callable,
        init_state: Any,
        n_streams: int,
        mesh: Optional[Mesh] = None,
        axis: str = "stream",
        batched_step: Optional[Callable] = None,
    ):
        self.n = n_streams
        self.mesh = mesh
        self.axis = axis
        self.states = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n_streams,) + a.shape), init_state
        )
        if mesh is not None:
            sharding = NamedSharding(mesh, P(axis))
            self.states = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), self.states
            )
        if batched_step is None:
            self._step = jax.jit(jax.vmap(step_fn))
            self._step_many = jax.jit(
                jax.vmap(lambda s, xs: jax.lax.scan(step_fn, s, xs)))
        else:
            # a hand-batched step ((states [N,...], xs [N,...]) -> ...)
            # preserves real lax.cond fast paths that vmap would lower to
            # run-both-branches selects (e.g. the loudnorm limiter's idle
            # path — 700x measured, see ops/loudnorm._limiter_scan_batched)
            self._step = jax.jit(batched_step)

            def many(s, xs):
                xs_k = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, 1), xs)
                s, ys = jax.lax.scan(batched_step, s, xs_k)
                return s, jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, 1), ys)

            self._step_many = jax.jit(many)

    def shard(self, x):
        """Place a [n_streams, ...] batch with the bank's stream sharding."""
        if self.mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, P(self.axis)))

    def process(self, x):
        """x: [n_streams, ...] one buffer per stream -> [n_streams, ...]."""
        self.states, y = self._step(self.states, x)
        return y

    def process_many(self, xs):
        """xs: [n_streams, k, ...] — k queued buffers per stream advanced in
        ONE dispatch (per-stream lax.scan); bit-equal to k process() calls.
        Amortizes dispatch latency when buffers back up (the threadshare
        analog of draining a socket's pending datagrams in one wakeup)."""
        self.states, ys = self._step_many(self.states, xs)
        return ys


def loudnorm_bank(n_streams: int, channels: int = 2, mesh: Optional[Mesh] = None,
                  loudness_target: float = -24.0, dtype=jnp.float32) -> StreamBank:
    """A bank of audioloudnorm engines: every tick consumes one 100 ms frame
    per stream in a single dispatch (after per-stream first-frame init)."""
    from ..ops import loudnorm as LN

    params = LN.loudnorm_params(loudness_target, 7.0, -2.0, channels, dtype)
    init = LN.loudnorm_init(params, channels, 0.0, dtype)

    def step(state, frame):
        return LN.inner_frame_step(state, params, frame)

    bank = StreamBank(
        step, init, n_streams, mesh,
        batched_step=lambda states, frames: LN.inner_frame_step_batched(
            states, params, frames))

    _first = jax.jit(lambda s, x: LN.first_frame_step_batched(s, params, x))

    def first_frame(first3s):
        """Run the 3 s first frame for every stream in one dispatch.
        first3s: [n_streams, 3 s, ch] -> [n_streams, 100 ms, ch]."""
        bank.states, outs = _first(bank.states, bank.shard(first3s))
        return outs

    bank.first_frame = first_frame  # type: ignore[attr-defined]
    return bank


def r128_bank(n_streams: int, channels: int = 2, rate: int = 48000,
              mesh: Optional[Mesh] = None, dtype=jnp.float32):
    """A bank of EBU R-128 analyzers (one per stream) with a merged
    integrated-loudness query: the per-stream gating histograms reduce over
    the (possibly mesh-sharded) stream axis — the shared-histogram psum of
    SURVEY.md §2.3."""
    from ..core.audio import default_channel_positions
    from ..ops.ebur128 import (
        loudness_global,
        merged_loudness_global,
        r128_add_full_subblocks,
        r128_init,
        r128_params,
    )

    params = r128_params(rate, default_channel_positions(channels), dtype)
    init = r128_init(params, channels, dtype)

    def step(state, x):
        return r128_add_full_subblocks(state, params, x), x

    bank = StreamBank(step, init, n_streams, mesh)

    _merged = jax.jit(lambda s: merged_loudness_global(s, params))
    _per_stream = jax.jit(jax.vmap(lambda s: loudness_global(s, params)))

    def add_frames(x):
        """x: [n_streams, k*n100, ch] whole subblocks per stream."""
        bank.process(bank.shard(x))

    def merged_loudness() -> float:
        return float(_merged(bank.states))

    def per_stream_loudness():
        return np.asarray(_per_stream(bank.states))

    bank.add_frames = add_frames  # type: ignore[attr-defined]
    bank.merged_loudness = merged_loudness  # type: ignore[attr-defined]
    bank.per_stream_loudness = per_stream_loudness  # type: ignore[attr-defined]
    return bank


def echo_bank(n_streams: int, rate: int = 48000, channels: int = 2,
              delay_ns: int = 250_000_000, intensity: float = 0.5,
              feedback: float = 0.4, mesh: Optional[Mesh] = None) -> StreamBank:
    from ..ops.echo import echo_apply_flat, echo_lag_samples, echo_ring_size

    S = echo_ring_size(1_000_000_000, rate, channels)
    lag = echo_lag_samples(delay_ns, 1_000_000_000, rate, channels)
    init = jnp.zeros((S,), jnp.float32)

    def step(hist, x):
        out, hist = echo_apply_flat(
            x, hist, jnp.float32(intensity), jnp.float32(feedback), lag=lag
        )
        return hist, out

    return StreamBank(step, init, n_streams, mesh)


__all__ = ["StreamBank", "make_stream_mesh", "echo_bank", "loudnorm_bank", "r128_bank"]
