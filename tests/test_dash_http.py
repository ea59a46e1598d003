"""dashsink2, reqwesthttpsrc (loopback http.server), icecastsink (fake
icecast server) tests."""
import os
import socket
import threading
import xml.etree.ElementTree as ET
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.mux import reader


class TestDashSink:
    def test_two_representations_and_mpd(self, tmp_path):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        sink = fx.element_factory_make("dashsink2")
        sink.set_property("mpd-root-path", str(tmp_path))
        sink.set_property("target-duration", 1)
        p = fx.Pipeline()
        p.add(sink)
        # audio representation
        asrc = fx.element_factory_make("audiotestsrc")
        asrc.set_property("wave", "sine"); asrc.set_property("num-buffers", 20)
        asrc.set_property("samplesperbuffer", 4800)
        acaps = fx.element_factory_make("capsfilter")
        acaps.set_property("caps", parse_caps("audio/x-raw,format=S16,rate=48000,channels=2"))
        # video representation
        vsrc = fx.element_factory_make("videotestsrc")
        vsrc.set_property("pattern", "gradient"); vsrc.set_property("num-buffers", 20)
        vcaps = fx.element_factory_make("capsfilter")
        vcaps.set_property("caps", parse_caps("video/x-raw,format=RGB,width=64,height=32,framerate=10/1"))
        for e in (asrc, acaps, vsrc, vcaps):
            p.add(e)
        asrc.link(acaps); acaps.pad("src").link(sink.request_sink_pad())
        vsrc.link(vcaps); vcaps.pad("src").link(sink.request_sink_pad())
        p.play_until_eos()

        files = sorted(os.listdir(tmp_path))
        assert "manifest.mpd" in files
        assert "init_0.mp4" in files and "init_1.mp4" in files
        # 2 s of content at 1 s segments -> 2 segments per representation
        assert "seg_0_1.m4s" in files and "seg_0_2.m4s" in files
        assert "seg_1_1.m4s" in files and "seg_1_2.m4s" in files
        # init segments parse as valid fMP4 headers
        assert reader.box_types((tmp_path / "init_0.mp4").read_bytes()) == ["ftyp", "moov"]

        root = ET.parse(tmp_path / "manifest.mpd").getroot()
        ns = {"mpd": "urn:mpeg:dash:schema:mpd:2011"}
        sets = root.findall(".//mpd:AdaptationSet", ns)
        assert {s.get("mimeType") for s in sets} == {"audio/mp4", "video/mp4"}
        reps = root.findall(".//mpd:Representation", ns)
        assert len(reps) == 2
        tmpl = root.find(".//mpd:SegmentTemplate", ns)
        assert tmpl.get("startNumber") == "1"
        timeline = root.findall(".//mpd:SegmentTimeline/mpd:S", ns)
        assert len(timeline) == 4  # 2 per representation


class _Handler(BaseHTTPRequestHandler):
    payload = b"0123456789" * 5000  # 50 kB

    def do_GET(self):
        if self.path == "/auth" and self.headers.get("Authorization") != "Basic dXNlcjpwdw==":
            self.send_response(401); self.end_headers(); return
        body = self.payload
        rng = self.headers.get("Range")
        if rng and self.path != "/norange" and rng.startswith("bytes="):
            lo_s, _, hi_s = rng[len("bytes="):].partition("-")
            lo = int(lo_s)
            hi = int(hi_s) + 1 if hi_s else len(body)
            body = body[lo:hi]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {lo}-{lo + len(body) - 1}/{len(self.payload)}")
        else:
            self.send_response(200)
            if self.path != "/norange":
                self.send_header("Accept-Ranges", "bytes")
        self.send_header("Content-Type", "application/x-test")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestReqwestHttpSrc:
    def test_fetch_and_caps(self, http_server):
        p = fx.parse_launch(f"reqwesthttpsrc location={http_server}/file ! appsink name=sink")
        p.play_until_eos()
        sink = p.by_name("sink")
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert data == _Handler.payload
        assert sink.caps.structure(0).name == "application/x-test"

    def test_basic_auth(self, http_server):
        p = fx.parse_launch(
            f"reqwesthttpsrc location={http_server}/auth user-id=user user-pw=pw "
            "! appsink name=sink"
        )
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in p.by_name("sink").samples)
        assert data == _Handler.payload

    # Range-request seeking (net/reqwest/tests/reqwesthttpsrc.rs
    # test_seek_after_ready / test_seek_with_stop_position)
    def test_seek_before_playing(self, http_server):
        from gst_plugins_rs_tpu.core.events import Event

        p = fx.parse_launch(
            f"reqwesthttpsrc name=src location={http_server}/file blocksize=4096 "
            "! appsink name=sink")
        src = p.by_name("src")
        assert src.handle_seek(Event.new_seek(10_000, fmt="bytes"))
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in p.by_name("sink").samples)
        assert data == _Handler.payload[10_000:]
        first = p.by_name("sink").samples[0].buffer
        assert first.offset == 10_000

    def test_seek_with_stop_position(self, http_server):
        from gst_plugins_rs_tpu.core.events import Event

        p = fx.parse_launch(
            f"reqwesthttpsrc name=src location={http_server}/file blocksize=4096 "
            "! appsink name=sink")
        p.by_name("src").handle_seek(
            Event.new_seek(10_000, 20_000, fmt="bytes"))
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in p.by_name("sink").samples)
        assert data == _Handler.payload[10_000:20_000]

    def test_seek_rejected_without_range_support(self, http_server):
        from gst_plugins_rs_tpu.core.events import Event

        p = fx.parse_launch(
            f"reqwesthttpsrc name=src location={http_server}/norange "
            "! appsink name=sink")
        p.by_name("src").handle_seek(Event.new_seek(10_000, fmt="bytes"))
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="Range"):
            p.play_until_eos()

    def test_size_from_content_length(self, http_server):
        p = fx.parse_launch(
            f"reqwesthttpsrc name=src location={http_server}/file ! appsink name=sink")
        p.play_until_eos()
        assert p.by_name("src").duration_ns() == len(_Handler.payload)
        assert p.by_name("src").is_seekable()


class _FakeIcecast(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.request = b""
        self.body = b""

    def run(self):
        conn, _ = self.sock.accept()
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(4096)
        self.request, _, rest = data.partition(b"\r\n\r\n")
        conn.sendall(b"HTTP/1.1 100 Continue\r\n\r\n")
        self.body = rest
        conn.settimeout(1.0)
        try:
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    break
                self.body += chunk
        except socket.timeout:
            pass
        conn.close()


class TestIcecast:
    def test_stream_to_fake_server(self):
        srv = _FakeIcecast()
        srv.start()
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=3 samplesperbuffer=480 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! mulawenc ! icecastsink name=ice "
            f"port={srv.port} mount=/radio stream-name=TestRadio content-type=audio/basic"
        )
        p.play_until_eos()
        srv.join(timeout=3)
        req = srv.request.decode()
        assert req.startswith("PUT /radio HTTP/1.1")
        assert "Ice-Name: TestRadio" in req
        assert "Authorization: Basic" in req
        assert "Content-Type: audio/basic" in req
        assert len(srv.body) == 3 * 480  # mu-law bytes streamed


def test_dashsink2_media_named_request_pads(tmp_path):
    """Reference-named request pads audio_%u/video_%u work alongside the
    legacy sink_%u naming."""
    from gst_plugins_rs_tpu.core.parse import parse_caps

    sink = fx.element_factory_make("dashsink2")
    sink.set_property("mpd-root-path", str(tmp_path))
    sink.set_property("target-duration", 1)
    p = fx.Pipeline()
    p.add(sink)
    src = fx.element_factory_make("audiotestsrc")
    src.set_property("num-buffers", 20); src.set_property("samplesperbuffer", 4800)
    capsf = fx.element_factory_make("capsfilter")
    capsf.set_property("caps", parse_caps("audio/x-raw,format=S16,rate=48000,channels=2"))
    p.add(src); p.add(capsf)
    src.link(capsf)
    pad = sink.request_pad("audio_%u")
    assert pad.name == "audio_0"
    capsf.pad("src").link(pad)
    p.play_until_eos()
    assert "manifest.mpd" in os.listdir(tmp_path)


class _ScenarioHandler(BaseHTTPRequestHandler):
    """Server for the reqwesthttpsrc scenario matrix
    (net/reqwest/tests/reqwesthttpsrc.rs): header echo, ICY, L16, error
    codes and proxying (absolute-URI GETs)."""

    payload = b"abcdefghij" * 100
    seen = {}

    def do_GET(self):
        path = self.path
        if path.startswith("http://"):  # proxied absolute-URI request
            _ScenarioHandler.seen["proxied"] = path
            path = "/" + path.split("/", 3)[3]
        _ScenarioHandler.seen["headers"] = dict(self.headers)
        if path == "/404":
            self.send_response(404); self.end_headers(); return
        if path == "/403":
            self.send_response(403); self.end_headers(); return
        ct = "application/x-test"
        extra = []
        if path == "/icy":
            extra = [("icy-name", "Scenario Radio"), ("icy-genre", "tests"),
                     ("icy-metaint", "8192")]
        if path == "/l16":
            ct = "audio/L16;rate=48000;channels=2"
        self.send_response(200)
        self.send_header("Content-Type", ct)
        self.send_header("Content-Length", str(len(self.payload)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(self.payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def scenario_server():
    srv = HTTPServer(("127.0.0.1", 0), _ScenarioHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _fetch(location, **props):
    src = fx.element_factory_make("reqwesthttpsrc")
    src.set_property("location", location)
    for k, v in props.items():
        src.set_property(k, v)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src); p.add(sink)
    src.link(sink)
    p.play_until_eos()
    data = b"".join(np.asarray(s.buffer.data).tobytes()
                    for s in sink.samples)
    return data, sink, src


class TestReqwestHttpSrcScenarios:
    """Named mirrors of net/reqwest/tests/reqwesthttpsrc.rs (the seek /
    auth / content-length scenarios live in TestReqwestHttpSrc above)."""

    def test_basic_request(self, scenario_server):
        data, sink, _ = _fetch(f"{scenario_server}/file")
        assert data == _ScenarioHandler.payload
        assert sink.caps.structure(0).name == "application/x-test"

    def test_basic_request_inverted_defaults(self, scenario_server):
        data, _, _ = _fetch(f"{scenario_server}/file", compress=True,
                            **{"keep-alive": False, "iradio-mode": False})
        assert data == _ScenarioHandler.payload

    def test_extra_headers(self, scenario_server):
        _fetch(f"{scenario_server}/file",
               **{"extra-headers": {"X-Custom": "1", "X-Two": "b"}})
        seen = _ScenarioHandler.seen["headers"]
        assert seen.get("X-Custom") == "1" and seen.get("X-Two") == "b"

    def test_cookies_property(self, scenario_server):
        _fetch(f"{scenario_server}/file",
               cookies=["foo=1", "bar=2"])
        assert _ScenarioHandler.seen["headers"].get("Cookie") == "foo=1; bar=2"

    test_cookies = test_cookies_property  # the reference's pipeline variant

    def test_iradio_mode(self, scenario_server):
        data, sink, src = _fetch(f"{scenario_server}/icy",
                                 **{"iradio-mode": True})
        # Icy-MetaData: 1 requested, icy-* headers surfaced, ICY caps
        assert _ScenarioHandler.seen["headers"].get("Icy-Metadata") == "1" \
            or _ScenarioHandler.seen["headers"].get("Icy-MetaData") == "1"
        assert src.iradio_info["icy-name"] == "Scenario Radio"
        assert src.iradio_info["icy-genre"] == "tests"
        s = sink.caps.structure(0)
        assert s.name == "application/x-icy"
        assert s.get("metadata-interval") == 8192

    def test_audio_l16(self, scenario_server):
        data, sink, _ = _fetch(f"{scenario_server}/l16")
        s = sink.caps.structure(0)
        assert s.name == "audio/x-unaligned-raw"
        assert s.get("format") == "S16BE"
        assert s.get("rate") == 48000 and s.get("channels") == 2

    def test_404_error(self, scenario_server):
        with pytest.raises(Exception):
            _fetch(f"{scenario_server}/404")

    def test_403_error(self, scenario_server):
        with pytest.raises(Exception):
            _fetch(f"{scenario_server}/403")

    def test_network_error(self):
        # a port nothing listens on: connection refused surfaces as error
        with pytest.raises(Exception):
            _fetch("http://127.0.0.1:1/file", timeout=1)

    def test_proxy(self, scenario_server):
        port = int(scenario_server.rsplit(":", 1)[1])
        data, _, _ = _fetch("http://example.invalid/file",
                            proxy=f"http://127.0.0.1:{port}")
        assert data == _ScenarioHandler.payload
        assert _ScenarioHandler.seen["proxied"].startswith(
            "http://example.invalid/")

    def test_proxy_prop_souphttpsrc_compatibility(self):
        src = fx.element_factory_make("reqwesthttpsrc")
        src.set_property("proxy", "127.0.0.1:8080")
        assert src.get_property("proxy") == "http://127.0.0.1:8080"
