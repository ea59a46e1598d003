"""whipclientsink/whipserversrc and whepclientsrc/whepserversink interop
over the real ICE+DTLS-SRTP stack on loopback."""
import struct
import threading
import time

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


def _rtp(seq, pt=96, payload=b"\x5a" * 24):
    return struct.pack("!BBHII", 0x80, pt, seq & 0xFFFF, seq * 3000, 0xFEED) + payload


def test_whip_client_to_server():
    """whipclientsink ingests into whipserversrc; payload arrives intact."""
    server_src = fx.element_factory_make("whipserversrc")
    server_src.set_property("auth-token", "tok123")
    server_src.set_property("timeout", 6_000_000_000)
    appsink = fx.element_factory_make("appsink")
    p_srv = fx.Pipeline()
    p_srv.add(server_src, appsink)
    server_src.link(appsink)

    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=video,encoding-name=AV1,clock-rate=90000,payload=98"))
    client = fx.element_factory_make("whipclientsink")
    client.set_property("auth-token", "tok123")
    p_cli = fx.Pipeline()
    p_cli.add(appsrc, client)
    appsrc.link(client)

    from gst_plugins_rs_tpu.core.element import State
    p_srv.set_state(State.PLAYING)
    client.set_property("whip-endpoint", f"http://127.0.0.1:{server_src.bound_port}/whip")

    exc = []
    def run_srv():
        try:
            p_srv.by_name(appsink.name)  # pipeline alive
            p_srv.run()
        except Exception as e:
            exc.append(e)
    t_srv = threading.Thread(target=run_srv, daemon=True)
    t_srv.start()

    packets = [_rtp(i, pt=98) for i in range(8)]
    appsrc.push_buffer(fx.Buffer(np.frombuffer(packets[0], np.uint8)))

    def run_cli():
        try:
            p_cli.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_cli = threading.Thread(target=run_cli, daemon=True)
    t_cli.start()

    # wait for the DTLS leg, then pace the remaining packets through the
    # live pipeline (a cold-start burst can outrun the server's first reads)
    deadline = time.monotonic() + 20
    while (client._pc is None or not client._pc._connected.is_set()) \
            and time.monotonic() < deadline:
        time.sleep(0.05)
    for pk in packets[1:]:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(pk, np.uint8)))
        time.sleep(0.01)
    appsrc.end_of_stream()

    deadline = time.monotonic() + 30
    while len(appsink.samples) < 8 and time.monotonic() < deadline:
        time.sleep(0.05)
    got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples]
    assert got[:8] == packets
    # caps taken from the client's offer rtpmap
    s = appsink.samples[0].caps.structure(0)
    assert s.get("encoding-name") == "AV1"
    assert int(s.get("payload")) == 98
    t_cli.join(10)
    p_srv.set_state(State.NULL)
    t_srv.join(10)
    assert not exc


def test_whip_auth_rejected():
    server_src = fx.element_factory_make("whipserversrc")
    server_src.set_property("auth-token", "right")
    from gst_plugins_rs_tpu.core.element import State
    server_src.set_state(State.PAUSED)
    try:
        from urllib.error import HTTPError
        from urllib.request import Request, urlopen
        req = Request(f"http://127.0.0.1:{server_src.bound_port}/whip",
                      data=b"v=0", method="POST",
                      headers={"Authorization": "Bearer wrong"})
        with pytest.raises(HTTPError) as ei:
            urlopen(req, timeout=5)
        assert ei.value.code == 401
    finally:
        server_src.set_state(State.NULL)


def test_whep_server_to_client():
    """whepserversink fans media out to a whepclientsrc viewer."""
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=audio,encoding-name=OPUS,clock-rate=48000,payload=111"))
    server_sink = fx.element_factory_make("whepserversink")
    p_srv = fx.Pipeline()
    p_srv.add(appsrc, server_sink)
    appsrc.link(server_sink)

    from gst_plugins_rs_tpu.core.element import State
    p_srv.set_state(State.PLAYING)

    client = fx.element_factory_make("whepclientsrc")
    client.set_property("whep-endpoint", f"http://127.0.0.1:{server_sink.bound_port}/whep")
    client.set_property("caps",
                        "application/x-rtp,media=audio,encoding-name=OPUS,clock-rate=48000,payload=111")
    client.set_property("timeout", 6_000_000_000)
    appsink = fx.element_factory_make("appsink")
    p_cli = fx.Pipeline()
    p_cli.add(client, appsink)
    client.link(appsink)

    exc = []
    def run_cli():
        try:
            p_cli.play_until_eos()
        except Exception as e:
            exc.append(e)
    t = threading.Thread(target=run_cli, daemon=True)
    t.start()

    deadline = time.monotonic() + 15
    while server_sink.viewer_count() < 1 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert server_sink.viewer_count() == 1

    packets = [_rtp(i, pt=111) for i in range(6)]
    for p in packets:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(p, np.uint8)))
    threading.Thread(target=p_srv.run, daemon=True).start()

    deadline = time.monotonic() + 10
    while len(appsink.samples) < 6 and time.monotonic() < deadline:
        time.sleep(0.05)
    got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples]
    assert got[:6] == packets
    appsrc.end_of_stream()
    p_srv.set_state(State.NULL)
    t.join(10)
    assert not exc
