"""janusvrwebrtcsink/src against an in-process fake Janus VideoRoom SFU.

The fake server speaks the public Janus WebSocket API (create/attach/
join/publish/start/keepalive) and actually terminates WebRTC like the
real thing: publisher media is received over DTLS-SRTP and fanned out to
subscribers over separate DTLS-SRTP legs.
"""
import json
import struct
import threading
import time

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net.webrtc_peer import PeerConnection

from websockets.sync.server import serve as ws_serve


class FakeJanus:
    def __init__(self):
        self._next_id = 1000
        self.rooms = {}  # room -> {"publisher": pc, "subscribers": [pc], "media": (...)}
        self._lock = threading.RLock()
        self.server = ws_serve(self._handle, "127.0.0.1", 0,
                               subprotocols=["janus-protocol"])
        self.port = self.server.socket.getsockname()[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()
        self.keepalives = 0

    @property
    def uri(self):
        return f"ws://127.0.0.1:{self.port}"

    def stop(self):
        self.server.shutdown()
        with self._lock:
            for room in self.rooms.values():
                if room.get("publisher"):
                    room["publisher"].close()
                for pc in room.get("subscribers", []):
                    pc.close()

    def _new_id(self):
        with self._lock:
            self._next_id += 1
            return self._next_id

    def _handle(self, ws):
        assert ws.subprotocol == "janus-protocol"
        state = {}
        for raw in ws:
            msg = json.loads(raw)
            kind = msg["janus"]
            tid = msg.get("transaction")
            if kind == "create":
                state["session"] = self._new_id()
                ws.send(json.dumps({"janus": "success", "transaction": tid,
                                    "data": {"id": state["session"]}}))
            elif kind == "attach":
                state["handle"] = self._new_id()
                ws.send(json.dumps({"janus": "success", "transaction": tid,
                                    "data": {"id": state["handle"]}}))
            elif kind == "keepalive":
                self.keepalives += 1
                ws.send(json.dumps({"janus": "ack", "transaction": tid}))
            elif kind in ("detach", "destroy"):
                ws.send(json.dumps({"janus": "success", "transaction": tid}))
            elif kind == "message":
                self._plugin(ws, state, msg)

    def _plugin(self, ws, state, msg):
        body = msg.get("body", {})
        tid = msg["transaction"]
        req = body.get("request")
        if req == "join":
            state["room"] = body["room"]
            state["ptype"] = body["ptype"]
            with self._lock:
                room = self.rooms.setdefault(body["room"], {"subscribers": []})
            if body["ptype"] == "subscriber":
                # send the SFU's offer toward the viewer in the join reply
                pc = PeerConnection(offerer=True)
                media = room.get("media", ("video", 96, "VP8", 90000))
                pc.set_media(*media)
                pc.start()
                with self._lock:
                    room["subscribers"].append(pc)
                offer = pc.create_offer("sendonly")
                state["sub_pc"] = pc
                ws.send(json.dumps({
                    "janus": "event", "transaction": tid,
                    "plugindata": {"plugin": "janus.plugin.videoroom",
                                   "data": {"videoroom": "attached"}},
                    "jsep": {"type": "offer", "sdp": offer},
                }))
            else:
                ws.send(json.dumps({
                    "janus": "event", "transaction": tid,
                    "plugindata": {"plugin": "janus.plugin.videoroom",
                                   "data": {"videoroom": "joined", "id": body.get("id", 1)}},
                }))
        elif req == "publish":
            offer = msg["jsep"]["sdp"]
            pc = PeerConnection(offerer=False)
            room = self.rooms[state["room"]]

            def fanout(pkt, room=room):
                with self._lock:
                    subs = list(room["subscribers"])
                for sub in subs:
                    sub.send_rtp(pkt)

            pc.on_rtp = fanout
            pc.start()
            answer = pc.handle_offer(offer, "recvonly")
            import re
            m = re.search(r"^m=(\w+) \d+ [\w/]+ (\d+)", offer, re.M)
            rtpmap = re.search(r"^a=rtpmap:(\d+) ([\w\-]+)/(\d+)", offer, re.M)
            with self._lock:
                room["publisher"] = pc
                if m and rtpmap:
                    room["media"] = (m.group(1), int(rtpmap.group(1)),
                                     rtpmap.group(2), int(rtpmap.group(3)))
            ws.send(json.dumps({
                "janus": "event", "transaction": tid,
                "plugindata": {"plugin": "janus.plugin.videoroom",
                               "data": {"videoroom": "event", "configured": "ok"}},
                "jsep": {"type": "answer", "sdp": answer},
            }))
        elif req == "start":
            answer = msg["jsep"]["sdp"]
            state["sub_pc"].handle_answer(answer)
            ws.send(json.dumps({
                "janus": "event", "transaction": tid,
                "plugindata": {"plugin": "janus.plugin.videoroom",
                               "data": {"videoroom": "event", "started": "ok"}},
            }))
        elif req == "unpublish":
            ws.send(json.dumps({
                "janus": "event", "transaction": tid,
                "plugindata": {"plugin": "janus.plugin.videoroom",
                               "data": {"videoroom": "event", "unpublished": "ok"}},
            }))


@pytest.fixture()
def janus():
    s = FakeJanus()
    yield s
    s.stop()


def _rtp(seq, pt=96, payload=b"\x42" * 20):
    return struct.pack("!BBHII", 0x80, pt, seq & 0xFFFF, seq * 3000, 0xBEEF) + payload


def test_publish_and_subscribe(janus):
    # publisher pipeline
    appsrc = fx.element_factory_make("appsrc")
    appsrc.set_property("caps", parse_caps(
        "application/x-rtp,media=video,encoding-name=H264,clock-rate=90000,payload=102"))
    sink = fx.element_factory_make("janusvrwebrtcsink")
    sink.set_property("janus-endpoint", janus.uri)
    sink.set_property("room-id", 1234)
    sink.set_property("display-name", "tpu-pub")
    p_pub = fx.Pipeline()
    p_pub.add(appsrc, sink)
    appsrc.link(sink)

    exc = []
    def run_pub():
        try:
            p_pub.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_pub = threading.Thread(target=run_pub, daemon=True)
    t_pub.start()

    # wait until the publisher leg is connected
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline:
        if sink._pc is not None and sink._pc._connected.is_set():
            break
        time.sleep(0.05)
    assert sink._pc is not None and sink._pc._connected.is_set()

    # subscriber pipeline
    src = fx.element_factory_make("janusvrwebrtcsrc")
    src.set_property("janus-endpoint", janus.uri)
    src.set_property("room-id", 1234)
    src.set_property("feed-id", 1)
    src.set_property("timeout", 2_000_000_000)
    appsink = fx.element_factory_make("appsink")
    p_sub = fx.Pipeline()
    p_sub.add(src, appsink)
    src.link(appsink)

    def run_sub():
        try:
            p_sub.play_until_eos()
        except Exception as e:
            exc.append(e)
    t_sub = threading.Thread(target=run_sub, daemon=True)
    t_sub.start()

    deadline = time.monotonic() + 15
    while time.monotonic() < deadline:
        if src._pc is not None and src._pc._connected.is_set():
            break
        time.sleep(0.05)
    assert src._pc is not None and src._pc._connected.is_set()

    packets = [_rtp(i, pt=102) for i in range(6)]
    for p in packets:
        appsrc.push_buffer(fx.Buffer(np.frombuffer(p, np.uint8)))
    appsrc.end_of_stream()

    deadline = time.monotonic() + 10
    while len(appsink.samples) < 6 and time.monotonic() < deadline:
        time.sleep(0.05)
    got = [bytes(np.asarray(s.buffer.data, np.uint8)) for s in appsink.samples]
    assert got[:6] == packets
    # caps propagated from the SFU's offer (publisher's rtpmap)
    s = appsink.samples[0].caps.structure(0)
    assert s.get("encoding-name") == "H264"
    assert int(s.get("payload")) == 102

    t_pub.join(10)
    t_sub.join(10)
    assert not exc
