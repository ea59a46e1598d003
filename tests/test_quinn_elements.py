"""quinn element tests: QUIC sink->src over UDP loopback, mux/demux
stream+datagram routing, RoQ framing round trips."""
import struct
import threading
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.elements.net.quinn import QuinnQuicMeta


def _rtp(seq, pt=96, payload=b"\x77" * 16):
    return struct.pack("!BBHII", 0x80, pt, seq & 0xFFFF, seq * 3000, 0xFACE) + payload


def _run_quic_pair(push_fn, src_props=None, n_expected=1, timeout=10.0):
    """Start quinnquicsrc (server) + quinnquicsink (client); call push_fn
    with (appsrc), wait for n_expected samples on the receiving appsink."""
    qsrc = fx.element_factory_make("quinnquicsrc")
    qsrc.set_property("bind-address", "127.0.0.1")
    qsrc.set_property("bind-port", 0)
    qsrc.set_property("idle-timeout", 2_000_000_000)
    for k, v in (src_props or {}).items():
        qsrc.set_property(k, v)
    appsink = fx.element_factory_make("appsink")
    p_srv = fx.Pipeline()
    p_srv.add(qsrc, appsink)
    qsrc.link(appsink)

    from gst_plugins_rs_tpu.core.element import State
    p_srv.set_state(State.PLAYING)
    exc = []

    def run_srv():
        try:
            p_srv.run()
        except Exception as e:
            exc.append(e)
    t_srv = threading.Thread(target=run_srv, daemon=True)
    t_srv.start()

    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps("application/octet-stream"))
    qsink = fx.element_factory_make("quinnquicsink")
    qsink.set_property("port", qsrc.bound_port)
    p_cli = fx.Pipeline()
    p_cli.add(appsrc, qsink)
    appsrc.link(qsink)

    push_fn(appsrc)
    appsrc.end_of_stream()

    def run_cli():
        try:
            p_cli.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_cli = threading.Thread(target=run_cli, daemon=True)
    t_cli.start()

    deadline = time.monotonic() + timeout
    while len(appsink.samples) < n_expected and time.monotonic() < deadline:
        time.sleep(0.05)
    t_cli.join(10)
    p_srv.set_state(State.NULL)
    t_srv.join(10)
    assert not exc, exc
    return appsink


class TestQuicElements:
    def test_sink_to_src_stream_data(self):
        payloads = [bytes([i]) * 400 for i in range(5)]

        def push(appsrc):
            for p in payloads:
                appsrc.push_buffer(fx.Buffer(np.frombuffer(p, np.uint8)))

        sink = _run_quic_pair(push, n_expected=1)
        got = b"".join(bytes(np.asarray(s.buffer.data, np.uint8)) for s in sink.samples)
        assert got == b"".join(payloads)
        # stream data is tagged with its QUIC stream id
        meta = sink.samples[0].buffer.get_meta(QuinnQuicMeta)
        assert meta is not None and not meta.datagram


class TestMuxDemux:
    def test_stream_and_datagram_routing(self):
        mux = fx.element_factory_make("quinnquicmux")
        pad_a = mux.request_sink_pad()          # stream_0
        pad_dg = mux.request_datagram_pad()     # datagram
        demux = fx.element_factory_make("quinnquicdemux")
        sink_a = fx.element_factory_make("appsink", "a")
        sink_dg = fx.element_factory_make("appsink", "dg")

        src_a = fx.element_factory_make("appsrc")
        src_a.set_property("caps", parse_caps("application/octet-stream"))
        src_dg = fx.element_factory_make("appsrc")
        src_dg.set_property("caps", parse_caps("application/octet-stream"))

        p = fx.Pipeline()
        for e in (src_a, src_dg, mux, demux, sink_a, sink_dg):
            p.add(e)
        src_a.pad("src").link(pad_a)
        src_dg.pad("src").link(pad_dg)
        mux.link(demux)

        routed = {}
        def on_new_pad(pad):
            target = sink_dg if pad.name == "datagram" else sink_a
            pad.link(target.pad("sink"))
            routed[pad.name] = True
        demux.on_new_pad = on_new_pad

        src_a.push_buffer(fx.Buffer(np.frombuffer(b"stream-data", np.uint8)))
        src_dg.push_buffer(fx.Buffer(np.frombuffer(b"datagram-data", np.uint8)))
        src_a.end_of_stream()
        src_dg.end_of_stream()
        p.play_until_eos()

        assert bytes(np.asarray(sink_a.samples[0].buffer.data, np.uint8)) == b"stream-data"
        assert bytes(np.asarray(sink_dg.samples[0].buffer.data, np.uint8)) == b"datagram-data"
        assert set(routed) == {"stream_0", "datagram"}


class TestRoq:
    def test_stream_mode_roundtrip(self):
        mux = fx.element_factory_make("quinnroqmux")
        pad = mux.request_stream_pad(flow_id=9)
        demux = fx.element_factory_make("quinnroqdemux")
        out = fx.element_factory_make("appsink")

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        p = fx.Pipeline()
        for e in (src, mux, demux, out):
            p.add(e)
        src.pad("src").link(pad)
        mux.link(demux)

        flows = {}
        # sometimes pads: link as they appear
        orig_pad_for = demux._pad_for
        def pad_for(flow_id):
            pad = orig_pad_for(flow_id)
            if pad.peer is None:
                pad.link(out.pad("sink"))
                flows[flow_id] = True
            return pad
        demux._pad_for = pad_for

        pkts = [_rtp(i) for i in range(4)]
        for pkt in pkts:
            src.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()

        got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in out.samples]
        assert got == pkts
        assert list(flows) == [9]

    def test_datagram_mode_roundtrip(self):
        mux = fx.element_factory_make("quinnroqmux")
        pad = mux.request_datagram_pad(flow_id=3)
        demux = fx.element_factory_make("quinnroqdemux")
        out = fx.element_factory_make("appsink")
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        p = fx.Pipeline()
        for e in (src, mux, demux, out):
            p.add(e)
        src.pad("src").link(pad)
        mux.link(demux)
        orig_pad_for = demux._pad_for
        demux._pad_for = lambda fid: (lambda pd: (pd.link(out.pad("sink"))
                                                  if pd.peer is None else None, pd)[1])(orig_pad_for(fid))
        pkt = _rtp(42)
        src.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert bytes(np.asarray(out.samples[0].buffer.data, np.uint8)) == pkt

    def test_end_to_end_over_quic(self):
        """roqmux ! quinnquicsink --UDP--> quinnquicsrc ! roqdemux."""
        qsrc = fx.element_factory_make("quinnquicsrc")
        qsrc.set_property("bind-address", "127.0.0.1")
        qsrc.set_property("bind-port", 0)
        qsrc.set_property("idle-timeout", 2_000_000_000)
        demux = fx.element_factory_make("quinnroqdemux")
        out = fx.element_factory_make("appsink")
        p_srv = fx.Pipeline()
        p_srv.add(qsrc, demux, out)
        qsrc.link(demux)
        orig_pad_for = demux._pad_for
        def pad_for(fid):
            pad = orig_pad_for(fid)
            if pad.peer is None:
                pad.link(out.pad("sink"))
            return pad
        demux._pad_for = pad_for

        from gst_plugins_rs_tpu.core.element import State
        p_srv.set_state(State.PLAYING)
        exc = []
        t_srv = threading.Thread(target=lambda: p_srv.run(), daemon=True)
        t_srv.start()

        appsrc = fx.element_factory_make("appsrc")
        appsrc.set_property("caps", parse_caps("application/x-rtp"))
        mux = fx.element_factory_make("quinnroqmux")
        pad = mux.request_stream_pad(flow_id=5)
        qsink = fx.element_factory_make("quinnquicsink")
        qsink.set_property("port", qsrc.bound_port)
        p_cli = fx.Pipeline()
        p_cli.add(appsrc, mux, qsink)
        appsrc.pad("src").link(pad)
        mux.link(qsink)

        pkts = [_rtp(i, pt=111) for i in range(6)]
        for pkt in pkts:
            appsrc.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
        appsrc.end_of_stream()

        t_cli = threading.Thread(target=p_cli.play_until_eos, daemon=True)
        t_cli.start()

        deadline = time.monotonic() + 10
        while len(out.samples) < 6 and time.monotonic() < deadline:
            time.sleep(0.05)
        got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in out.samples]
        assert got[:6] == pkts
        t_cli.join(10)
        p_srv.set_state(State.NULL)
        t_srv.join(10)


class TestWebTransport:
    def test_session_establishment_and_media(self):
        """quinnwtsink (client CONNECT) -> quinnwtsrc (server) over UDP."""
        wsrc = fx.element_factory_make("quinnwtsrc")
        wsrc.set_property("bind-address", "127.0.0.1")
        wsrc.set_property("bind-port", 0)
        wsrc.set_property("idle-timeout", 2_000_000_000)
        appsink = fx.element_factory_make("appsink")
        p_srv = fx.Pipeline()
        p_srv.add(wsrc, appsink)
        wsrc.link(appsink)

        from gst_plugins_rs_tpu.core.element import State
        p_srv.set_state(State.PLAYING)
        t_srv = threading.Thread(target=p_srv.run, daemon=True)
        t_srv.start()

        appsrc = fx.element_factory_make("appsrc")
        appsrc.set_property("caps", parse_caps("application/octet-stream"))
        wsink = fx.element_factory_make("quinnwtsink")
        wsink.set_property("port", wsrc.bound_port)
        wsink.set_property("url", f"https://127.0.0.1:{wsrc.bound_port}/stream")
        p_cli = fx.Pipeline()
        p_cli.add(appsrc, wsink)
        appsrc.link(wsink)

        chunks = [bytes([i]) * 256 for i in range(4)]
        for c in chunks:
            appsrc.push_buffer(fx.Buffer(np.frombuffer(c, np.uint8)))
        appsrc.end_of_stream()

        t_cli = threading.Thread(target=p_cli.play_until_eos, daemon=True)
        t_cli.start()

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            total = sum(len(np.asarray(s.buffer.data)) for s in appsink.samples)
            if total >= sum(len(c) for c in chunks):
                break
            time.sleep(0.05)
        got = b"".join(bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples)
        assert got == b"".join(chunks)
        # session went through the extended CONNECT (server side still live)
        assert wsrc._session is not None
        assert wsrc._session.established.is_set()
        assert wsrc._session.session_id is not None
        t_cli.join(10)
        p_srv.set_state(State.NULL)
        t_srv.join(10)

    def test_datagram_path(self):
        wsrc = fx.element_factory_make("quinnwtsrc")
        wsrc.set_property("bind-address", "127.0.0.1")
        wsrc.set_property("bind-port", 0)
        wsrc.set_property("idle-timeout", 2_000_000_000)
        appsink = fx.element_factory_make("appsink")
        p_srv = fx.Pipeline()
        p_srv.add(wsrc, appsink)
        wsrc.link(appsink)
        from gst_plugins_rs_tpu.core.element import State
        p_srv.set_state(State.PLAYING)
        t_srv = threading.Thread(target=p_srv.run, daemon=True)
        t_srv.start()

        appsrc = fx.element_factory_make("appsrc")
        appsrc.set_property("caps", parse_caps("application/octet-stream"))
        wsink = fx.element_factory_make("quinnwtsink")
        wsink.set_property("port", wsrc.bound_port)
        wsink.set_property("use-datagram", True)
        p_cli = fx.Pipeline()
        p_cli.add(appsrc, wsink)
        appsrc.link(wsink)
        appsrc.push_buffer(fx.Buffer(np.frombuffer(b"wt-datagram", np.uint8)))
        appsrc.end_of_stream()
        t_cli = threading.Thread(target=p_cli.play_until_eos, daemon=True)
        t_cli.start()
        deadline = time.monotonic() + 10
        while not appsink.samples and time.monotonic() < deadline:
            time.sleep(0.05)
        assert appsink.samples
        assert bytes(np.asarray(appsink.samples[0].buffer.data, np.uint8)) == b"wt-datagram"
        t_cli.join(10)
        p_srv.set_state(State.NULL)
        t_srv.join(10)


class TestReferencePropertySurface:
    def test_aliases_and_stats(self):
        sink = fx.element_factory_make("quinnquicsink")
        sink.set_property("server-address", "10.0.0.1")
        sink.set_property("server-port", 1234)
        assert sink.get_property("address") == "10.0.0.1"
        assert sink.get_property("port") == 1234
        sink.set_property("bind-port", 7)
        assert sink.get_property("client-port") == 7
        # stats readable before any connection exists
        s = sink.get_property("stats")
        assert s.name == "stats"

    def test_send_window_caps_cwnd_and_stats_live(self):
        # exercise a pair with tuned transport knobs end to end
        qsrc = fx.element_factory_make("quinnquicsrc")
        qsrc.set_property("bind-address", "127.0.0.1")
        qsrc.set_property("bind-port", 0)
        qsrc.set_property("receive-window", 1 << 20)
        qsrc.set_property("max-concurrent-uni-streams", 8)
        appsink = fx.element_factory_make("appsink")
        p_srv = fx.Pipeline()
        p_srv.add(qsrc, appsink)
        qsrc.link(appsink)
        from gst_plugins_rs_tpu.core.element import State
        p_srv.set_state(State.PLAYING)
        t = threading.Thread(target=p_srv.run, daemon=True)
        t.start()

        appsrc = fx.element_factory_make("appsrc")
        appsrc.set_property("caps", parse_caps("application/octet-stream"))
        qsink = fx.element_factory_make("quinnquicsink")
        qsink.set_property("port", qsrc.bound_port)
        qsink.set_property("send-window", 65536)
        qsink.set_property("initial-mtu", 1280)
        qsink.set_property("keep-alive-interval", 50_000_000)
        p_cli = fx.Pipeline()
        p_cli.add(appsrc, qsink)
        appsrc.link(qsink)
        appsrc.push_buffer(fx.Buffer(np.zeros(4096, np.uint8)))
        p_cli.set_state(State.PLAYING)
        t_cli = threading.Thread(target=p_cli.run, daemon=True)
        t_cli.start()
        deadline = time.monotonic() + 8
        while time.monotonic() < deadline and not appsink.samples:
            time.sleep(0.05)
        assert appsink.samples
        conn = qsink._ep.conn
        assert conn.MTU == 1280
        assert conn._send_window == 65536
        stats = qsink.get_property("stats")
        assert stats["cwnd"] > 0
        appsrc.end_of_stream()
        t_cli.join(10)
        p_cli.set_state(State.NULL)
        p_srv.set_state(State.NULL)
        t.join(10)


def test_sink_drains_queued_data_before_teardown():
    """Tearing the sender down right after EOS must not lose the tail:
    on_paused_to_ready drains pending/cwnd-held stream data until acked
    (quinn's SendStream::finish contract). Regression: a 100 kB buffer
    (far beyond the initial congestion window) used to truncate at the
    first flight."""
    import socket as socklib
    from gst_plugins_rs_tpu.core.element import State

    s = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    qsrc = fx.element_factory_make("quinnquicsrc")
    qsrc.set_property("bind-address", "127.0.0.1")
    qsrc.set_property("bind-port", port)
    qsink = fx.element_factory_make("quinnquicsink")
    qsink.set_property("address", "127.0.0.1")
    qsink.set_property("port", port)
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps("application/octet-stream"))
    appsink = fx.element_factory_make("appsink")
    p_rx = fx.Pipeline(); p_rx.add(qsrc, appsink); qsrc.link(appsink)
    p_tx = fx.Pipeline(); p_tx.add(appsrc, qsink); appsrc.link(qsink)
    p_rx.set_state(State.PLAYING)
    t_rx = threading.Thread(target=p_rx.run, daemon=True)
    t_rx.start()
    payload = bytes(range(256)) * 400  # 102400 bytes >> initial cwnd
    appsrc.push_buffer(fx.Buffer(np.frombuffer(payload, np.uint8)))
    appsrc.end_of_stream()
    p_tx.play_until_eos()  # drops to NULL immediately after dispatch
    deadline = time.monotonic() + 10
    got = b""
    while time.monotonic() < deadline and len(got) < len(payload):
        got = b"".join(np.asarray(x.buffer.data).tobytes()
                       for x in appsink.samples)
        time.sleep(0.05)
    assert got == payload
    p_rx.set_state(State.NULL)
