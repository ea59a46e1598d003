"""ts-* element surface: clocksync, input-selector, rtpdtmfsrc, tcpclientsrc,
and the aliased context variants."""
import socket
import struct
import threading
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


def test_aliases_exist():
    for n in ("ts-appsrc", "ts-audiotestsrc", "ts-queue", "ts-blocking-adapter",
              "ts-intersink", "ts-intersrc"):
        assert fx.element_factory_make(n) is not None


def test_clocksync_delays_to_running_time():
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    cs = fx.element_factory_make("ts-clocksync")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, cs, sink)
    src.link(cs)
    cs.link(sink)
    for i in range(3):
        b = fx.Buffer(np.zeros(4, np.uint8))
        b.pts = i * 100_000_000  # 100 ms apart
        src.push_buffer(b)
    src.end_of_stream()
    t0 = time.monotonic()
    p.play_until_eos()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.18  # had to wait ~200 ms for the last buffer
    assert len(sink.samples) == 3


def test_clocksync_sync_false_passthrough():
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    cs = fx.element_factory_make("ts-clocksync")
    cs.set_property("sync", False)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, cs, sink)
    src.link(cs)
    cs.link(sink)
    b = fx.Buffer(np.zeros(4, np.uint8))
    b.pts = 10_000_000_000  # 10 s in the future: must NOT sleep
    src.push_buffer(b)
    src.end_of_stream()
    t0 = time.monotonic()
    p.play_until_eos()
    assert time.monotonic() - t0 < 2.0


def test_input_selector_switches():
    s1 = fx.element_factory_make("appsrc")
    s1.set_property("caps", parse_caps("application/octet-stream"))
    s2 = fx.element_factory_make("appsrc")
    s2.set_property("caps", parse_caps("application/octet-stream"))
    sel = fx.element_factory_make("ts-input-selector")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(s1, s2, sel, sink)
    s1.link(sel)
    s2.link(sel)
    sel.link(sink)
    for i in range(3):
        s1.push_buffer(fx.Buffer(np.full(2, 1, np.uint8)))
        s2.push_buffer(fx.Buffer(np.full(2, 2, np.uint8)))
    s1.end_of_stream()
    s2.end_of_stream()
    p.play_until_eos()
    # only sink_0 (active by default) flowed
    vals = {int(np.asarray(s.buffer.data)[0]) for s in sink.samples}
    assert vals == {1}
    assert len(sink.samples) == 3


def test_rtpdtmfsrc_rfc4733():
    src = fx.element_factory_make("ts-rtpdtmfsrc")
    src.set_property("tones", "5")
    src.set_property("tone-duration-ms", 120)
    src.set_property("packet-ms", 40)
    src.set_property("ssrc", 42)
    src.set_property("seqnum-offset", 0)   # default -1 = random
    src.set_property("timestamp-offset", 0)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, sink)
    src.link(sink)
    p.play_until_eos()
    assert len(sink.samples) == 1
    raw = bytes(np.asarray(sink.samples[0].buffer.data, np.uint8))
    pkts = []
    off = 0
    while off < len(raw):  # length-prefixed packet framing
        n = struct.unpack("!H", raw[off:off + 2])[0]
        pkts.append(raw[off + 2:off + 2 + n])
        off += 2 + n
    # 120ms/40ms = 3 increments, last has E bit + 2 retransmits = 5 packets
    assert len(pkts) == 5
    first = pkts[0]
    assert first[1] & 0x80  # marker on first packet of the event
    event, flags, dur = struct.unpack("!BBH", first[12:16])
    assert event == 5 and not (flags & 0x80) and dur == 320  # 40 ms @ 8 kHz
    last = pkts[-1]
    event, flags, dur = struct.unpack("!BBH", last[12:16])
    assert flags & 0x80 and dur == 960  # E bit, 120 ms total
    # retransmitted end packets share the payload, fresh seqnums
    seqs = [struct.unpack("!H", pk[2:4])[0] for pk in pkts]
    assert seqs == list(range(5))
    assert pkts[-1][12:] == pkts[-2][12:]
    assert src.get_property("seqnum") == 4  # read-only last-seq counter
    s = sink.samples[0].caps.structure(0)
    assert s.get("encoding-name") == "TELEPHONE-EVENT"


def test_tcpclientsrc_reads_stream():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    payload = bytes(range(256)) * 20

    def serve():
        conn, _ = srv.accept()
        conn.sendall(payload)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    src = fx.element_factory_make("ts-tcpclientsrc")
    src.set_property("port", port)
    src.set_property("blocksize", 1000)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, sink)
    src.link(sink)
    p.play_until_eos()
    got = b"".join(bytes(np.asarray(s.buffer.data, np.uint8)) for s in sink.samples)
    assert got == payload
    srv.close()


def test_shared_context_many_udpsrc():
    """N ts-udpsrc on one named context share a single drain thread
    (threadshare Context::acquire analog, native epoll when available)."""
    import threading as _threading
    from gst_plugins_rs_tpu.net.context import Context

    srcs, pipes, sinks = [], [], []
    for i in range(4):
        p = fx.parse_launch(
            "ts-udpsrc address=127.0.0.1 port=0 context=bench-ctx "
            "timeout=500000000 num-buffers=5 ! appsink name=sink")
        from gst_plugins_rs_tpu.core.element import State
        p.set_state(State.PLAYING)
        srcs.append(p.elements[0])
        pipes.append(p)
        sinks.append(p.by_name("sink"))
    # one shared context behind all four elements
    assert len([t for t in _threading.enumerate()
                if t.name == "gstpu-ctx-bench-ctx"]) == 1

    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for k in range(5):
        for i, s in enumerate(srcs):
            tx.sendto(bytes([i, k]) * 8, ("127.0.0.1", s.bound_port))
    threads = [threading.Thread(target=p.run, daemon=True) for p in pipes]
    for t in threads:
        t.start()
    for t in threads:
        t.join(5)
    for i, snk in enumerate(sinks):
        got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in snk.samples]
        assert got == [bytes([i, k]) * 8 for k in range(5)]
    from gst_plugins_rs_tpu.core.element import State
    for p in pipes:
        p.set_state(State.NULL)
    # refcount released: the context unregisters
    assert "bench-ctx" not in Context._registry
    tx.close()


# -- state-cycling robustness (threadshare tests/pad.rs start_stop_start /
#    socket_play_null_play / premature_shutdown analogs) --------------------

def _udp_pipeline(port):
    p = fx.parse_launch(
        f"ts-udpsrc port={port} timeout=50000000 ! appsink name=sink")
    return p, p.by_name("sink")


def test_udpsrc_play_null_play():
    """The bound socket is released on NULL and rebinds on the next PLAY;
    data flows in both incarnations (socket_play_null_play)."""
    import socket as socklib
    from gst_plugins_rs_tpu.core.element import State

    probe = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    tx = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    for incarnation in range(2):
        p, sink = _udp_pipeline(port)
        src = p.elements[0]
        src.set_state(State.PLAYING)
        tx.sendto(bytes([incarnation]) * 32, ("127.0.0.1", port))
        deadline = time.monotonic() + 5
        got = []
        while time.monotonic() < deadline and not got:
            p.run(max_iterations=1)
            got = [np.asarray(s.buffer.data).tobytes() for s in sink.samples]
        assert got and got[0] == bytes([incarnation]) * 32
        p.set_state(State.NULL)  # must release the port for round 2


def test_queue_start_pause_start():
    """ts-queue keeps flowing across PAUSED<->PLAYING cycles on a shared
    context (start_pause_start)."""
    from gst_plugins_rs_tpu.core.element import State
    from gst_plugins_rs_tpu.core.parse import parse_caps

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    q = fx.element_factory_make("ts-queue")
    q.set_property("context", "cycle-ctx")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, q, sink):
        p.add(e)
    src.link(q); q.link(sink)
    p.set_state(State.PLAYING)
    src.push_buffer(fx.Buffer(np.zeros(8, np.uint8), pts=0))
    p.run(max_iterations=3)
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and len(sink.samples) < 1:
        time.sleep(0.02)
    assert len(sink.samples) == 1
    p.set_state(State.PAUSED)
    p.set_state(State.PLAYING)
    src.push_buffer(fx.Buffer(np.ones(8, np.uint8), pts=1))
    src.end_of_stream()
    p.play_until_eos()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and len(sink.samples) < 2:
        time.sleep(0.02)
    assert len(sink.samples) == 2
    p.set_state(State.NULL)


def test_premature_shutdown_mid_stream():
    """Dropping to NULL while buffers are in flight neither hangs nor
    corrupts; the pipeline restarts cleanly (premature_shutdown)."""
    from gst_plugins_rs_tpu.core.element import State
    from gst_plugins_rs_tpu.core.parse import parse_caps

    for _ in range(2):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        q = fx.element_factory_make("ts-queue")
        q.set_property("context", "premature-ctx")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, q, sink):
            p.add(e)
        src.link(q); q.link(sink)
        p.set_state(State.PLAYING)
        for i in range(50):
            src.push_buffer(fx.Buffer(np.zeros(64, np.uint8), pts=i))
        p.set_state(State.NULL)  # mid-stream teardown, queue non-empty
