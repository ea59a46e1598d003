"""Multi-stream throughput benchmark harness.

Analog of the reference's threadshare benchmark
(generic/threadshare/examples/benchmark.rs: buffers/sec over wall-clock
windows for N streams): runs N parallel streams through a device-batched
effects chain and reports buffers/sec and realtime-x per window.

Usage:
    python -m gst_plugins_rs_tpu.parallel.benchmark --streams 64 \
        --chain echo,loudnorm --seconds 10 --window 2
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def run(streams: int, chain: str, seconds: float, window: float, use_mesh: bool) -> None:
    import jax
    import jax.numpy as jnp

    from .streams import echo_bank, loudnorm_bank, make_stream_mesh

    mesh = make_stream_mesh() if use_mesh and len(jax.devices()) > 1 else None
    rng = np.random.RandomState(0)

    banks = []
    frame_len = None
    rate = 48000
    for name in chain.split(","):
        name = name.strip()
        if name == "echo":
            banks.append(("echo", echo_bank(streams, mesh=mesh)))
        elif name == "loudnorm":
            rate = 192_000
            b = loudnorm_bank(streams, channels=2, mesh=mesh)
            first = jnp.asarray(
                rng.uniform(-0.5, 0.5, (streams, 3 * rate, 2)).astype(np.float32)
            )
            b.first_frame(first)
            banks.append(("loudnorm", b))
        else:
            raise SystemExit(f"unknown chain element {name!r}")

    # one buffer = 100 ms per stream
    if any(n == "loudnorm" for n, _ in banks):
        frame = jnp.asarray(rng.uniform(-0.5, 0.5, (streams, 19200, 2)).astype(np.float32))
        flat_frame = frame.reshape(streams, -1)
        buffer_secs = 0.1
    else:
        frame = jnp.asarray(rng.uniform(-0.5, 0.5, (streams, 4800, 2)).astype(np.float32))
        flat_frame = frame.reshape(streams, -1)
        buffer_secs = 0.1

    def tick():
        x = frame
        for name, bank in banks:
            if name == "echo":
                y = bank.process(bank.shard(x.reshape(streams, -1)))
                x = y.reshape(x.shape)
            else:
                x = bank.process(bank.shard(x))
        return x

    # warmup/compile
    out = tick()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    print(f"# streams={streams} chain={chain} mesh={'yes' if mesh else 'no'}")
    t_end = time.time() + seconds
    while time.time() < t_end:
        t0 = time.time()
        n_bufs = 0
        while time.time() - t0 < window:
            out = tick()
            n_bufs += streams
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        dt = time.time() - t0
        print(
            f"buffers/sec: {n_bufs / dt:10.1f}   realtime-x: {n_bufs * buffer_secs / dt:8.1f}"
            f"   ({streams} streams)"
        )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--chain", default="echo")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--window", type=float, default=2.0)
    ap.add_argument("--mesh", action="store_true", help="shard streams over all devices")
    args = ap.parse_args()
    run(args.streams, args.chain, args.seconds, args.window, args.mesh)


if __name__ == "__main__":
    main()
