"""awskvswebrtcsink / uepswebrtcsink against fake signaling servers, plus
SigV4 vectors from the AWS documentation."""
import base64
import datetime
import json
import struct
import threading
import time

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net import sigv4
from gst_plugins_rs_tpu.net.webrtc_peer import PeerConnection

from websockets.sync.server import serve as ws_serve


def _rtp(seq, pt=96, payload=b"\x21" * 16):
    return struct.pack("!BBHII", 0x80, pt, seq & 0xFFFF, seq * 3000, 0xD00D) + payload


class TestSigV4:
    def test_signing_key_aws_doc_example(self):
        """The worked example from AWS's 'Deriving the signing key' docs."""
        k = sigv4.signing_key(
            "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20150830", "us-east-1", "iam"
        )
        assert k.hex() == "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"

    def test_presign_roundtrip(self):
        now = datetime.datetime(2026, 1, 2, 3, 4, 5, tzinfo=datetime.timezone.utc)
        url = sigv4.presign_url(
            "GET", "wss://v-123.kinesisvideo.us-west-2.amazonaws.com/",
            "us-west-2", "kinesisvideo", "AKIDEXAMPLE", "secret",
            extra_params={"X-Amz-ChannelARN": "arn:aws:kinesisvideo:us-west-2:1:channel/x/2"},
            now=now,
        )
        assert "X-Amz-Signature=" in url and "X-Amz-ChannelARN=" in url
        assert sigv4.verify_presigned(url, "secret")
        assert not sigv4.verify_presigned(url, "wrong")

    def test_sign_headers_has_authorization(self):
        h = sigv4.sign_headers(
            "GET", "https://example.amazonaws.com/", "us-east-1", "service",
            "AKIDEXAMPLE", "secret",
            now=datetime.datetime(2015, 8, 30, 12, 36, tzinfo=datetime.timezone.utc),
        )
        assert h["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/")
        assert "SignedHeaders=" in h["Authorization"]


class FakeKvs:
    """KVS signaling channel: one master, viewers push base64 offers."""

    def __init__(self):
        self.master_ws = None
        self.viewer_ws = {}
        self.server = ws_serve(self._handle, "127.0.0.1", 0)
        self.port = self.server.socket.getsockname()[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    @property
    def uri(self):
        return f"ws://127.0.0.1:{self.port}"

    def stop(self):
        self.server.shutdown()

    def _handle(self, ws):
        # first connection is the master; others are viewers
        if self.master_ws is None:
            self.master_ws = ws
            for raw in ws:  # relay master messages to the addressed viewer
                msg = json.loads(raw)
                dest = self.viewer_ws.get(msg.get("recipientClientId"))
                if dest is not None:
                    dest.send(raw)
        else:
            client_id = None
            for raw in ws:
                msg = json.loads(raw)
                client_id = msg.get("senderClientId")
                self.viewer_ws[client_id] = ws
                self.master_ws.send(raw)


@pytest.fixture()
def kvs():
    s = FakeKvs()
    yield s
    s.stop()


def test_kvs_master_answers_viewer(kvs):
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=video,encoding-name=H264,clock-rate=90000,payload=96"))
    sink = fx.element_factory_make("awskvswebrtcsink")
    sink.set_property("address", kvs.uri)
    p = fx.Pipeline()
    p.add(appsrc, sink)
    appsrc.link(sink)

    exc = []
    t = threading.Thread(target=lambda: p.play_until_eos() if not exc else None, daemon=True)
    def run():
        try:
            p.play_until_eos()
        except Exception as e:
            exc.append(e)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.4)  # master connects

    # viewer: offer over the signaling channel, then receive media
    got = []
    viewer_pc = PeerConnection(offerer=True)
    viewer_pc.set_media("video", 96, "H264", 90000)
    viewer_pc.on_rtp = got.append
    viewer_pc.start()
    offer = viewer_pc.create_offer("recvonly")

    from websockets.sync.client import connect as ws_connect
    vws = ws_connect(kvs.uri, open_timeout=5)
    vws.send(json.dumps({
        "messageType": "SDP_OFFER",
        "messagePayload": base64.b64encode(json.dumps({"type": "offer", "sdp": offer}).encode()).decode(),
        "senderClientId": "viewer-1",
    }))
    raw = vws.recv(timeout=10)
    msg = json.loads(raw)
    assert msg["messageType"] == "SDP_ANSWER"
    answer = json.loads(base64.b64decode(msg["messagePayload"]))["sdp"]
    viewer_pc.handle_answer(answer)
    assert viewer_pc.wait_connected(10.0)

    packets = [_rtp(i) for i in range(5)]
    for pkt in packets:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
    appsrc.end_of_stream()
    deadline = time.monotonic() + 10
    while len(got) < 5 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert got[:5] == packets
    viewer_pc.close()
    vws.close()
    t.join(10)
    assert not exc


class FakeUeps:
    """Unreal Pixel Streaming signalling server with one player."""

    def __init__(self):
        self.streamer_ws = None
        self.player_ws = None
        self.log = []
        self.server = ws_serve(self._handle, "127.0.0.1", 0)
        self.port = self.server.socket.getsockname()[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    @property
    def uri(self):
        return f"ws://127.0.0.1:{self.port}"

    def stop(self):
        self.server.shutdown()

    def _handle(self, ws):
        if self.streamer_ws is None:
            self.streamer_ws = ws
            ws.send(json.dumps({"type": "config", "peerConnectionOptions": {},
                                "protocolVersion": "1.1"}))
            ws.send(json.dumps({"type": "identify"}))
            for raw in ws:
                msg = json.loads(raw)
                self.log.append(msg["type"])
                if msg["type"] == "endpointId":
                    ws.send(json.dumps({"type": "endpointIdConfirm",
                                        "committedId": msg["id"]}))
                elif msg["type"] in ("offer", "iceCandidate") and self.player_ws:
                    self.player_ws.send(raw)
        else:
            self.player_ws = ws
            self.streamer_ws.send(json.dumps({"type": "playerConnected",
                                              "playerId": "101",
                                              "dataChannel": False, "sfu": False}))
            for raw in ws:
                self.streamer_ws.send(raw)


@pytest.fixture()
def ueps():
    s = FakeUeps()
    yield s
    s.stop()


def test_ueps_streamer_flow(ueps):
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=video,encoding-name=H264,clock-rate=90000,payload=103"))
    sink = fx.element_factory_make("uepswebrtcsink")
    sink.set_property("signaller-uri", ueps.uri)
    sink.set_property("streamer-id", "tpu-ue")
    p = fx.Pipeline()
    p.add(appsrc, sink)
    appsrc.link(sink)

    exc = []
    def run():
        try:
            p.play_until_eos()
        except Exception as e:
            exc.append(e)
    t = threading.Thread(target=run, daemon=True)
    t.start()

    assert sink._id_confirmed.wait(10.0)
    assert sink.confirmed_id == "tpu-ue"

    # player side: receive the streamer's offer, answer, receive media
    got = []
    from websockets.sync.client import connect as ws_connect
    pws = ws_connect(ueps.uri, open_timeout=5)
    raw = pws.recv(timeout=10)
    offer_msg = json.loads(raw)
    assert offer_msg["type"] == "offer" and offer_msg["playerId"] == "101"
    player_pc = PeerConnection(offerer=False)
    player_pc.on_rtp = got.append
    player_pc.start()
    answer = player_pc.handle_offer(offer_msg["sdp"], "recvonly")
    pws.send(json.dumps({"type": "answer", "sdp": answer, "playerId": "101"}))

    deadline = time.monotonic() + 10
    while sink.connected_count() < 1 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert sink.connected_count() == 1

    packets = [_rtp(i, pt=103) for i in range(4)]
    for pkt in packets:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
    appsrc.end_of_stream()
    deadline = time.monotonic() + 10
    while len(got) < 4 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert got[:4] == packets
    player_pc.close()
    pws.close()
    t.join(10)
    assert not exc


def test_webrtcbin2_send_recv_application_driven():
    """webrtcsend/webrtcrecv: the app performs the SDP exchange itself."""
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=audio,encoding-name=OPUS,clock-rate=48000,payload=111"))
    send = fx.element_factory_make("webrtcsend")
    p_tx = fx.Pipeline()
    p_tx.add(appsrc, send)
    appsrc.link(send)

    recv = fx.element_factory_make("webrtcrecv")
    recv.set_property("timeout", 2_000_000_000)
    appsink = fx.element_factory_make("appsink")
    p_rx = fx.Pipeline()
    p_rx.add(recv, appsink)
    recv.link(appsink)

    exc = []
    def run_tx():
        try:
            p_tx.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_tx = threading.Thread(target=run_tx, daemon=True)
    t_tx.start()
    # wait for caps to reach the sender so its offer reflects them
    deadline = time.monotonic() + 5
    while send.caps is None and time.monotonic() < deadline:
        time.sleep(0.02)

    # application-driven SDP exchange
    offer = send.create_offer("sendonly")
    answer = recv.handle_offer(offer)
    send.handle_answer(answer)

    def run_rx():
        try:
            p_rx.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_rx = threading.Thread(target=run_rx, daemon=True)
    t_rx.start()

    deadline = time.monotonic() + 10
    while not (send.is_connected() and recv.is_connected()) and time.monotonic() < deadline:
        time.sleep(0.05)
    assert send.is_connected() and recv.is_connected()

    packets = [_rtp(i, pt=111) for i in range(5)]
    for pkt in packets:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(pkt, np.uint8)))
    appsrc.end_of_stream()
    deadline = time.monotonic() + 10
    while len(appsink.samples) < 5 and time.monotonic() < deadline:
        time.sleep(0.05)
    got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples]
    assert got[:5] == packets
    s = appsink.samples[0].caps.structure(0)
    assert s.get("encoding-name") == "OPUS" and int(s.get("payload")) == 111
    t_tx.join(10); t_rx.join(10)
    assert not exc
