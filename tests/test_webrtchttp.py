"""whipsink/whepsrc: WHIP/WHEP HTTP signaling against fake servers with
plain-RTP media legs."""
import re
import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net.rtp import RtpPacket


class _WhipHandler(BaseHTTPRequestHandler):
    """Accepts offers; answers with the server's UDP receive port."""

    server_version = "FakeWHIP/1"

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        offer = self.rfile.read(length).decode()
        self.server.offers.append((self.path, dict(self.headers), offer))
        m = re.search(r"^m=(\w+) (\d+) RTP/AVP (\d+)", offer, re.M)
        client_port = int(m.group(2))
        self.server.client_port = client_port
        answer = (
            "v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\ns=ans\r\nc=IN IP4 127.0.0.1\r\n"
            f"t=0 0\r\nm={m.group(1)} {self.server.media_port} RTP/AVP {m.group(3)}\r\n"
            f"a=rtpmap:{m.group(3)} PCMA/8000\r\n"
        ).encode()
        self.send_response(201)
        self.send_header("Location", "/resource/42")
        self.send_header("Content-Type", "application/sdp")
        self.send_header("Content-Length", str(len(answer)))
        self.end_headers()
        self.wfile.write(answer)

    def do_DELETE(self):
        self.server.deleted.append(self.path)
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def whip_server():
    srv = HTTPServer(("127.0.0.1", 0), _WhipHandler)
    srv.offers, srv.deleted, srv.client_port = [], [], None
    media = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    media.bind(("127.0.0.1", 0))
    media.settimeout(3)
    srv.media_port = media.getsockname()[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, media
    srv.shutdown()
    media.close()


class TestWhipSink:
    def test_signaling_and_media(self, whip_server):
        srv, media = whip_server
        p = fx.parse_launch(
            "audiotestsrc wave=ticks num-buffers=3 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! rtppcmapay2 ssrc=5 seqnum-offset=0 timestamp-offset=0 "
            f"! whipsink whip-endpoint=http://127.0.0.1:{srv.server_address[1]}/whip "
            "auth-token=secret123"
        )
        p.play_until_eos()
        # signaling: offer posted with bearer token; resource deleted
        assert len(srv.offers) == 1
        path, headers, offer = srv.offers[0]
        assert path == "/whip"
        assert headers.get("Authorization") == "Bearer secret123"
        assert "a=sendonly" in offer
        assert srv.deleted == ["/resource/42"]
        # media: RTP arrived at the port from the SDP answer
        pkts = []
        for _ in range(3):
            data, _addr = media.recvfrom(65536)
            pkts.append(RtpPacket.parse(data))
        assert [pk.sequence_number for pk in pkts] == [0, 1, 2]
        assert all(pk.ssrc == 5 for pk in pkts)


class TestWhepSrc:
    def test_receive(self, whip_server):
        srv, media = whip_server
        recv = fx.parse_launch(
            f"whepsrc whep-endpoint=http://127.0.0.1:{srv.server_address[1]}/whep "
            'num-buffers=3 timeout=2000000000 '
            'caps="application/x-rtp,media=audio,encoding-name=PCMA,clock-rate=8000,payload=8" '
            "! rtppcmadepay2 ! alawdec ! appsink name=sink"
        )
        src = recv.elements[0]
        src.set_state(fx.State.PAUSED)  # POST happens; offer carries our port
        assert srv.client_port is not None
        sender = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(3):
            pkt = RtpPacket(8, i, i * 160, 9, bytes([0x55]) * 160)
            sender.sendto(pkt.to_bytes(), ("127.0.0.1", srv.client_port))
        recv.play_until_eos()
        out = recv.by_name("sink").concat_audio()
        assert out.shape == (480, 1)
        assert "a=recvonly" in srv.offers[-1][2]
