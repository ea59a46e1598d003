"""whipsink/whepsrc — the webrtchttp names, now full DTLS-SRTP WebRTC.

whipsink streams into whipserversrc; whepsrc pulls from whepserversink
(HTTP signaling: POST offer + bearer auth, 201 + Location, DELETE)."""
import struct
import threading
import time

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.element import State
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net.rtp import RtpPacket


def test_whipsink_full_stack():
    """audiotestsrc ! alawenc ! rtppcmapay2 ! whipsink -> whipserversrc."""
    server_src = fx.element_factory_make("whipserversrc")
    server_src.set_property("auth-token", "secret123")
    server_src.set_property("timeout", 6_000_000_000)
    appsink = fx.element_factory_make("appsink")
    p_srv = fx.Pipeline()
    p_srv.add(server_src, appsink)
    server_src.link(appsink)
    p_srv.set_state(State.PLAYING)
    t_srv = threading.Thread(target=p_srv.run, daemon=True)
    t_srv.start()

    p = fx.parse_launch(
        "audiotestsrc wave=ticks num-buffers=3 samplesperbuffer=800 "
        "! audio/x-raw,format=S16,rate=8000,channels=1 "
        "! alawenc ! rtppcmapay2 ssrc=5 seqnum-offset=0 timestamp-offset=0 "
        f"! whipsink whip-endpoint=http://127.0.0.1:{server_src.bound_port}/whip "
        "auth-token=secret123"
    )
    p.play_until_eos()

    deadline = time.monotonic() + 10
    while len(appsink.samples) < 3 and time.monotonic() < deadline:
        time.sleep(0.05)
    pkts = [RtpPacket.parse(bytes(np.asarray(s.buffer.data, np.uint8)))
            for s in appsink.samples]
    assert [pk.sequence_number for pk in pkts] == [0, 1, 2]
    assert all(pk.ssrc == 5 for pk in pkts)
    # the server saw the negotiated PCMA rtpmap
    s = appsink.samples[0].caps.structure(0)
    assert s.get("encoding-name") == "PCMA"
    p_srv.set_state(State.NULL)
    t_srv.join(5)


def test_whipsink_wrong_token_fails():
    server_src = fx.element_factory_make("whipserversrc")
    server_src.set_property("auth-token", "right")
    server_src.set_state(State.PAUSED)
    try:
        sink = fx.element_factory_make("whipsink")
        sink.set_property("whip-endpoint",
                          f"http://127.0.0.1:{server_src.bound_port}/whip")
        sink.set_property("auth-token", "wrong")
        from urllib.error import HTTPError
        with pytest.raises(HTTPError):
            sink.on_caps(parse_caps(
                "application/x-rtp,media=audio,encoding-name=PCMA,clock-rate=8000,payload=8"))
    finally:
        server_src.set_state(State.NULL)


def test_whepsrc_full_stack():
    """whepserversink -> whepsrc with num-buffers bounding the session."""
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=audio,encoding-name=OPUS,clock-rate=48000,payload=111"))
    server_sink = fx.element_factory_make("whepserversink")
    p_srv = fx.Pipeline()
    p_srv.add(appsrc, server_sink)
    appsrc.link(server_sink)
    p_srv.set_state(State.PLAYING)

    src = fx.element_factory_make("whepsrc")
    src.set_property("whep-endpoint",
                     f"http://127.0.0.1:{server_sink.bound_port}/whep")
    src.set_property("caps",
                     "application/x-rtp,media=audio,encoding-name=OPUS,clock-rate=48000,payload=111")
    src.set_property("timeout", 6_000_000_000)
    src.set_property("num-buffers", 4)
    appsink = fx.element_factory_make("appsink")
    p_cli = fx.Pipeline()
    p_cli.add(src, appsink)
    src.link(appsink)

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

    pkts = [struct.pack("!BBHII", 0x80, 111, i, i * 960, 9) + bytes([i]) * 16
            for i in range(4)]
    for pk in pkts:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(pk, np.uint8)))
    threading.Thread(target=p_srv.run, daemon=True).start()

    t.join(15)
    got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples]
    assert got == pkts  # num-buffers=4 ended the stream exactly there
    appsrc.end_of_stream()
    p_srv.set_state(State.NULL)
    assert not exc
