"""Throughput benchmark harness — the threadshare benchmark.rs analog.

Reference: generic/threadshare/examples/benchmark.rs reports buffers/sec
over timed windows for N streams in M context groups (`benchmark 100 2
20` style CLI).  This harness measures both layers of the TPU design:

1. host path: N loopback UDP streams, each `ts-udpsrc -> ts-queue ->
   fakesink`, all sockets drained by the synchronous scheduler — the
   many-streams-few-threads design point
2. device path: the same N streams batched into ONE TPU dispatch per
   block via parallel.StreamBank (echo effect), reporting realtime-x

    python examples/benchmark.py [n_streams] [window_s] [payload_bytes]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import socket
import sys
import threading
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.element import State


def host_path(n_streams: int, window_s: float, payload: int) -> None:
    sinks = []
    pipes = []
    ports = []
    for i in range(n_streams):
        p = fx.parse_launch(
            "ts-udpsrc address=127.0.0.1 port=0 timeout=500000000 "
            "! ts-queue ! fakesink name=sink"
        )
        src = p.elements[0]
        p.set_state(State.PLAYING)
        ports.append(src.bound_port)
        pipes.append(p)
        sinks.append(p.by_name("sink"))

    stop = threading.Event()
    sent = [0]

    def sender():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        data = bytes(payload)
        while not stop.is_set():
            for port in ports:
                tx.sendto(data, ("127.0.0.1", port))
            sent[0] += len(ports)

    threads = [threading.Thread(target=sender, daemon=True)]
    for t in threads:
        t.start()

    def drain():
        while not stop.is_set():
            for p in pipes:
                p.run(max_iterations=1)

    d = threading.Thread(target=drain, daemon=True)
    d.start()
    t0 = time.monotonic()
    time.sleep(window_s)
    stop.set()
    d.join(2.0)  # let the drain loop exit before sockets close
    elapsed = time.monotonic() - t0
    received = sum(s.rendered for s in sinks)
    for p in pipes:
        p.set_state(State.NULL)
    print(f"host:   {n_streams} streams, {received / elapsed:,.0f} buffers/s "
          f"received ({sent[0] / elapsed:,.0f} sent/s)")


def device_path(n_streams: int, window_s: float) -> None:
    from gst_plugins_rs_tpu.parallel.streams import echo_bank

    RATE = 48000
    bank = echo_bank(n_streams, channels=2, rate=RATE,
                     delay_ns=250_000_000, intensity=0.5)
    block = np.random.default_rng(0).normal(
        0, 0.1, (n_streams, RATE // 10 * 2)).astype(np.float32)  # 100 ms blocks
    out = bank.process(block)  # compile
    np.asarray(out).sum()
    blocks = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < window_s:
        out = bank.process(block)
        blocks += 1
    np.asarray(out).sum()
    elapsed = time.monotonic() - t0
    audio_s = blocks * 0.1 * n_streams
    print(f"device: {n_streams} streams batched/dispatch, "
          f"{blocks / elapsed:,.1f} blocks/s = {audio_s / elapsed:,.0f}x realtime aggregate")


def native_path(n_streams: int, window_s: float, payload: int) -> None:
    """Drain the same N streams with the native epoll+recvmmsg receiver."""
    from gst_plugins_rs_tpu.net import netio

    if not netio.available():
        print("native: netio shim unavailable, skipped")
        return
    rx = netio.BatchReceiver(arena_bytes=4 << 20, max_msgs=4096)
    socks = []
    ports = []
    for tag in range(n_streams):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        s.setblocking(False)
        rx.add_socket(s, tag)
        socks.append(s)
        ports.append(s.getsockname()[1])
    stop = threading.Event()

    def sender():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        data = bytes(payload)
        while not stop.is_set():
            for port in ports:
                tx.sendto(data, ("127.0.0.1", port))

    threading.Thread(target=sender, daemon=True).start()
    received = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < window_s:
        received += len(rx.poll(timeout_ms=50))
    elapsed = time.monotonic() - t0
    stop.set()
    for s in socks:
        s.close()
    rx.close()
    print(f"native: {n_streams} streams, {received / elapsed:,.0f} buffers/s "
          f"drained via epoll+recvmmsg")


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    window_s = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    payload = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    host_path(n_streams, window_s, payload)
    native_path(n_streams, window_s, payload)
    device_path(n_streams, window_s)


if __name__ == "__main__":
    main()
