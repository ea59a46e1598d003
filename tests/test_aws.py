"""AWS elements against in-process fakes: S3 REST (SigV4-verified),
Polly, Translate, and Transcribe streaming (event-stream over WS)."""
import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net import eventstream
from gst_plugins_rs_tpu.net.s3 import S3Url


# ---------------------------------------------------------------------------
# fake S3


class FakeS3Handler(BaseHTTPRequestHandler):
    server_version = "FakeS3/1"

    def log_message(self, *a):
        pass

    def _check_sigv4(self):
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 Credential=AKID/"):
            self.send_error(403, "bad credential")
            return False
        return True

    def do_HEAD(self):
        if not self._check_sigv4():
            return
        obj = self.server.objects.get(self.path)
        if obj is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()

    def do_GET(self):
        if not self._check_sigv4():
            return
        obj = self.server.objects.get(self.path)
        if obj is None:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        status = 200
        if rng:
            m = re.match(r"bytes=(\d+)-(\d*)", rng)
            start = int(m.group(1))
            end = int(m.group(2)) + 1 if m.group(2) else len(obj)
            obj = obj[start:end]
            status = 206
        self.send_response(status)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()
        self.wfile.write(obj)

    def do_PUT(self):
        if not self._check_sigv4():
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        u = urllib.parse.urlsplit(self.path)
        q = dict(urllib.parse.parse_qsl(u.query))
        if "partNumber" in q:
            key = (u.path, q["uploadId"])
            self.server.parts.setdefault(key, {})[int(q["partNumber"])] = body
            self.send_response(200)
            self.send_header("ETag", f'"etag-{q["partNumber"]}"')
            self.end_headers()
        else:
            self.server.objects[u.path] = body
            self.server.put_log.append(u.path)
            self.send_response(200)
            self.send_header("ETag", '"etag-put"')
            self.end_headers()

    def do_POST(self):
        if not self._check_sigv4():
            return
        u = urllib.parse.urlsplit(self.path)
        q = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if "uploads" in q:
            upload_id = f"upload-{len(self.server.parts)}"
            self.server.parts[(u.path, upload_id)] = {}
            xml = (f"<InitiateMultipartUploadResult><UploadId>{upload_id}"
                   f"</UploadId></InitiateMultipartUploadResult>").encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(xml)))
            self.end_headers()
            self.wfile.write(xml)
        elif "uploadId" in q:
            parts = self.server.parts.get((u.path, q["uploadId"]), {})
            self.server.objects[u.path] = b"".join(parts[k] for k in sorted(parts))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    def do_DELETE(self):
        self.send_response(204)
        self.end_headers()


@pytest.fixture()
def s3():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeS3Handler)
    srv.objects, srv.parts, srv.put_log = {}, {}, []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv
    srv.shutdown()


def _creds(el, endpoint):
    el.set_property("access-key", "AKID")
    el.set_property("secret-access-key", "secret")
    el.set_property("endpoint-uri", endpoint)


class TestS3Url:
    def test_parse(self):
        u = S3Url.parse("s3://eu-west-1/my-bucket/path/to/file.mp4")
        assert (u.region, u.bucket, u.key) == ("eu-west-1", "my-bucket", "path/to/file.mp4")
        with pytest.raises(ValueError):
            S3Url.parse("s3://bucketonly")


class TestS3Elements:
    def test_src_ranged_reads(self, s3):
        payload = bytes(range(256)) * 300  # 76800 bytes
        s3.objects["/bkt/media.bin"] = payload
        src = fx.element_factory_make("awss3src")
        src.set_property("uri", "s3://us-east-1/bkt/media.bin")
        src.set_property("blocksize", 30000)
        _creds(src, s3.endpoint)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        p.play_until_eos()
        got = b"".join(bytes(np.asarray(s.buffer.data, np.uint8)) for s in sink.samples)
        assert got == payload
        assert len(sink.samples) == 3  # 30000 + 30000 + 16800

    def test_src_byte_seek(self, s3):
        """awss3src answers byte seeks with ranged GETs (pre-roll seek +
        stop position)."""
        from gst_plugins_rs_tpu.core.events import Event

        payload = bytes(range(256)) * 300
        s3.objects["/bkt/media.bin"] = payload
        src = fx.element_factory_make("awss3src")
        src.set_property("uri", "s3://us-east-1/bkt/media.bin")
        src.set_property("blocksize", 10_000)
        _creds(src, s3.endpoint)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        assert src.handle_seek(Event.new_seek(20_000, 45_000, fmt="bytes"))
        p.play_until_eos()
        got = b"".join(bytes(np.asarray(s.buffer.data, np.uint8))
                       for s in sink.samples)
        assert got == payload[20_000:45_000]
        assert src.duration_ns() == len(payload)
        assert sink.samples[0].buffer.offset == 20_000

    def test_multipart_sink(self, s3):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        sink = fx.element_factory_make("awss3sink")
        sink.set_property("uri", "s3://us-east-1/bkt/out.bin")
        sink.set_property("part-size", 1000)
        _creds(sink, s3.endpoint)
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        chunks = [bytes([i]) * 700 for i in range(5)]  # 3500 bytes -> 3 parts + tail
        for c in chunks:
            src.push_buffer(fx.Buffer(np.frombuffer(c, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert s3.objects["/bkt/out.bin"] == b"".join(chunks)

    def test_putobject_sink_flush_interval(self, s3):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        sink = fx.element_factory_make("awss3putobjectsink")
        sink.set_property("bucket", "bkt")
        sink.set_property("key", "grow.bin")
        sink.set_property("flush-interval-buffers", 2)
        _creds(sink, s3.endpoint)
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        for i in range(5):
            src.push_buffer(fx.Buffer(np.frombuffer(bytes([i]) * 10, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        # flushed at 2, 4 and EOS; object grows monotonically
        assert s3.objects["/bkt/grow.bin"] == b"".join(bytes([i]) * 10 for i in range(5))
        assert s3.put_log.count("/bkt/grow.bin") == 3

    def test_hls_sink_uploads_segments_and_playlist(self, s3):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/mp2t"))
        sink = fx.element_factory_make("awss3hlssink")
        sink.set_property("bucket", "bkt")
        sink.set_property("key-prefix", "live")
        sink.set_property("target-duration", 1_000_000_000)
        _creds(sink, s3.endpoint)
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        for i in range(6):
            b = fx.Buffer(np.frombuffer(bytes([i]) * 188, np.uint8))
            b.pts = i * 500_000_000
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        segs = [k for k in s3.objects if k.startswith("/bkt/live/segment")]
        assert len(segs) >= 2
        playlist = s3.objects["/bkt/live/playlist.m3u8"].decode()
        assert "#EXTM3U" in playlist and "segment00000.ts" in playlist

    def test_hls_sink_elementary_stream_pads(self, s3):
        """audio/video request pads feed an embedded mpegtsmux whose TS
        output is segmented and uploaded (the reference's s3hlssink wraps
        hlssink3 the same way)."""
        from gst_plugins_rs_tpu.mux import mpegts

        sink = fx.element_factory_make("awss3hlssink")
        sink.set_property("bucket", "bkt")
        sink.set_property("key-prefix", "es")
        sink.set_property("target-duration", 1_000_000_000)
        _creds(sink, s3.endpoint)
        vsrc = fx.element_factory_make("appsrc")
        vsrc.set_property("caps", parse_caps(
            "video/x-h264,stream-format=byte-stream"))
        p = fx.Pipeline()
        p.add(vsrc, sink)
        vsrc.pad("src").link(sink.request_pad("video"))
        frames = [bytes([0, 0, 0, 1, 0x65, i]) * 40 for i in range(25)]
        for i, fr in enumerate(frames):
            vsrc.push_buffer(fx.Buffer(np.frombuffer(fr, np.uint8),
                                       pts=i * 100_000_000))
        vsrc.end_of_stream()
        p.play_until_eos()
        segs = sorted(k for k in s3.objects if k.startswith("/bkt/es/segment"))
        assert len(segs) >= 2
        es = b""
        for k in segs:
            data = s3.objects[k]
            assert len(data) % 188 == 0
            es += b"".join(pk.payload for pk in mpegts.iter_packets(data)
                           if pk.pid == 0x101 and pk.payload)
        assert all(fr in es for fr in frames)
        assert "#EXTM3U" in s3.objects["/bkt/es/playlist.m3u8"].decode()


# ---------------------------------------------------------------------------
# Polly / Translate fakes


class FakeAwsApi(BaseHTTPRequestHandler):
    server_version = "FakeAWS/1"

    def log_message(self, *a):
        pass

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length))
        if not self.headers.get("Authorization", "").startswith("AWS4-HMAC-SHA256"):
            self.send_error(403)
            return
        if self.path == "/v1/speech":
            # 100 samples of a constant derived from the text length
            pcm = (np.ones(100, "<i2") * len(body["Text"])).tobytes()
            self.send_response(200)
            self.send_header("Content-Length", str(len(pcm)))
            self.end_headers()
            self.wfile.write(pcm)
        else:
            target = self.headers.get("x-amz-target", "")
            assert "TranslateText" in target
            out = json.dumps({
                "TranslatedText": body["Text"].upper(),
                "SourceLanguageCode": body["SourceLanguageCode"],
                "TargetLanguageCode": body["TargetLanguageCode"],
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)


@pytest.fixture()
def aws_api():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeAwsApi)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv
    srv.shutdown()


def _text_pipeline(element):
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, element, sink)
    src.link(element)
    element.link(sink)
    return p, src, sink


def test_polly_synthesizes(aws_api):
    el = fx.element_factory_make("awspolly")
    el.set_property("endpoint-uri", aws_api.endpoint)
    el.set_property("access-key", "AKID")
    el.set_property("secret-access-key", "secret")
    p, src, sink = _text_pipeline(el)
    src.push_buffer(fx.Buffer(np.frombuffer(b"hello world", np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    audio = np.asarray(sink.samples[0].buffer.data)
    assert audio.shape == (100, 1)
    assert int(audio[0, 0]) == len("hello world")
    s = sink.samples[0].caps.structure(0)
    assert s.get("rate") == 16000


def test_translate(aws_api):
    el = fx.element_factory_make("awstranslate")
    el.set_property("endpoint-uri", aws_api.endpoint)
    el.set_property("access-key", "AKID")
    el.set_property("secret-access-key", "secret")
    el.set_property("input-language-code", "en")
    el.set_property("output-language-code", "de")
    p, src, sink = _text_pipeline(el)
    src.push_buffer(fx.Buffer(np.frombuffer(b"guten tag", np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    assert bytes(np.asarray(sink.samples[0].buffer.data, np.uint8)) == b"GUTEN TAG"


# ---------------------------------------------------------------------------
# event-stream + transcriber


class TestEventStream:
    def test_roundtrip(self):
        msg = eventstream.encode_message(
            {":message-type": "event", ":event-type": "AudioEvent"},
            b"\x01\x02\x03",
        )
        headers, payload, total = eventstream.decode_message(msg)
        assert total == len(msg)
        assert headers[":event-type"] == "AudioEvent"
        assert payload == b"\x01\x02\x03"

    def test_crc_detected(self):
        msg = bytearray(eventstream.encode_message({"a": "b"}, b"xyz"))
        msg[-6] ^= 0xFF  # corrupt payload
        with pytest.raises(ValueError):
            eventstream.decode_message(bytes(msg))


def test_transcriber_streaming():
    """Fake Transcribe: echoes word counts back as final transcripts."""
    from websockets.sync.server import serve as ws_serve

    def handler(ws):
        n = 0
        for raw in ws:
            if isinstance(raw, str):
                raw = raw.encode()
            headers, payload, _ = eventstream.decode_message(raw)
            if not payload:
                break
            n += 1
            out = json.dumps({
                "Transcript": {"Results": [
                    {"IsPartial": True, "Alternatives": [{"Transcript": "uh"}]},
                    {"IsPartial": False,
                     "Alternatives": [{"Transcript": f"chunk {n}"}]},
                ]}
            }).encode()
            ws.send(eventstream.encode_message(
                {":message-type": "event", ":event-type": "TranscriptEvent"}, out))

    srv = ws_serve(handler, "127.0.0.1", 0)
    port = srv.socket.getsockname()[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        el = fx.element_factory_make("awstranscriber2")
        el.set_property("endpoint-uri", f"ws://127.0.0.1:{port}")
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps(
            "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, el, sink)
        src.link(el)
        el.link(sink)
        for i in range(3):
            src.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16)))
        src.end_of_stream()
        p.play_until_eos()
        texts = [bytes(np.asarray(s.buffer.data, np.uint8)).decode() for s in sink.samples]
        # partials dropped; finals delivered in order (last may be in flight at EOS)
        assert texts == [f"chunk {i + 1}" for i in range(len(texts))]
        assert len(texts) >= 2
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# round-3 reference-surface behaviors


def test_putobject_next_file_keyframe_split(s3):
    from gst_plugins_rs_tpu.core.buffer import BufferFlags

    sink = fx.element_factory_make("awss3putobjectsink")
    _creds(sink, s3.endpoint)
    sink.set_property("bucket", "vids")
    sink.set_property("key", "chunk")
    sink.set_property("next-file", "key-frame")
    sink.set_property("min-keyframe-distance", 1_000_000_000)
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("video/x-raw"))
    p = fx.Pipeline()
    p.add(src, sink)
    src.link(sink)
    for g in range(3):  # 3 GOPs 1s apart: key + delta
        key = fx.Buffer(np.full(4, g, np.uint8), pts=g * 1_000_000_000)
        src.push_buffer(key)
        delta = fx.Buffer(np.full(4, 0x80 + g, np.uint8),
                          pts=g * 1_000_000_000 + 500_000_000)
        delta.set_flag(BufferFlags.DELTA_UNIT)
        src.push_buffer(delta)
    src.end_of_stream()
    p.play_until_eos()
    # two splits happened (before GOP1 and GOP2 keyframes), final flush at EOS
    assert "/vids/chunk.00000" in s3.objects
    assert "/vids/chunk.00001" in s3.objects
    assert s3.objects["/vids/chunk.00000"] == bytes([0, 0, 0, 0, 0x80, 0x80, 0x80, 0x80])


def test_s3_uri_and_metadata_headers(s3):
    received = {}
    orig_put = FakeS3Handler.do_PUT

    def spy_put(self):
        received.update({k.lower(): v for k, v in self.headers.items()})
        orig_put(self)

    FakeS3Handler.do_PUT = spy_put
    try:
        sink = fx.element_factory_make("awss3putobjectsink")
        _creds(sink, s3.endpoint)
        sink.set_property("s3-uri", "s3://mybkt/my/key.bin")
        sink.set_property("cache-control", "max-age=60")
        sink.set_property("metadata", {"camera": "3"})
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        src.push_buffer(fx.Buffer(np.arange(8, dtype=np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert "/mybkt/my/key.bin" in s3.objects
        assert received.get("cache-control") == "max-age=60"
        assert received.get("x-amz-meta-camera") == "3"
    finally:
        FakeS3Handler.do_PUT = orig_put


def test_polly_overflow_clip_and_compress(aws_api):
    # fake returns 100 samples @16k = 6.25ms; cue duration 2ms = 32 samples
    for mode, expect in (("clip", 32), ("nothing", 100)):
        el = fx.element_factory_make("awspolly")
        el.set_property("endpoint-uri", aws_api.endpoint)
        el.set_property("access-key", "AKID")
        el.set_property("secret-access-key", "secret")
        el.set_property("overflow", mode)
        p, src, sink = _text_pipeline(el)
        src.push_buffer(fx.Buffer(np.frombuffer(b"hello world", np.uint8),
                                  pts=0, duration=2_000_000))
        src.end_of_stream()
        p.play_until_eos()
        assert np.asarray(sink.samples[0].buffer.data).shape[0] == expect, mode
    # compress with max-overflow 1ms -> target 32+16=48 samples
    el = fx.element_factory_make("awspolly")
    el.set_property("endpoint-uri", aws_api.endpoint)
    el.set_property("access-key", "AKID")
    el.set_property("secret-access-key", "secret")
    el.set_property("overflow", "compress")
    el.set_property("max-overflow", 1)
    p, src, sink = _text_pipeline(el)
    src.push_buffer(fx.Buffer(np.frombuffer(b"hello world", np.uint8),
                              pts=0, duration=2_000_000))
    src.end_of_stream()
    p.play_until_eos()
    out = np.asarray(sink.samples[0].buffer.data)
    assert out.shape[0] == 48
    assert int(out[0, 0]) == len("hello world")  # values survive resampling


def test_translate_punctuation_tokenization(aws_api):
    el = fx.element_factory_make("awstranslate")
    el.set_property("endpoint-uri", aws_api.endpoint)
    el.set_property("access-key", "AKID")
    el.set_property("secret-access-key", "secret")
    el.set_property("tokenization-method", "punctuation")
    el.set_property("accumulator-lateness", 5)
    p, src, sink = _text_pipeline(el)
    src.push_buffer(fx.Buffer(np.frombuffer(b"one. two! three", np.uint8), pts=0))
    src.end_of_stream()
    p.play_until_eos()
    assert bytes(np.asarray(sink.samples[0].buffer.data, np.uint8)) == \
        b"ONE. TWO! THREE"
    assert sink.samples[0].buffer.pts == 5_000_000  # lateness shift


def test_transcriber_translate_pads():
    """translate_src_%u pads carry per-language translations of every
    final transcript; unsynced pads mirror them (transcriber/imp.rs
    request_new_pad creates both)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from websockets.sync.server import serve as ws_serve

    def ts_handler(ws):
        n = 0
        for raw in ws:
            if isinstance(raw, str):
                raw = raw.encode()
            _, payload, _ = eventstream.decode_message(raw)
            if not payload:
                break
            n += 1
            out = json.dumps({"Transcript": {"Results": [
                {"IsPartial": False,
                 "Alternatives": [{"Transcript": f"hello {n}"}]}]}}).encode()
            ws.send(eventstream.encode_message(
                {":message-type": "event", ":event-type": "TranscriptEvent"},
                out))

    ts_srv = ws_serve(ts_handler, "127.0.0.1", 0)
    threading.Thread(target=ts_srv.serve_forever, daemon=True).start()
    fake_transcribe_server = f"ws://127.0.0.1:{ts_srv.socket.getsockname()[1]}"

    class TrHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            out = json.dumps({"TranslatedText":
                              f"[{body['TargetLanguageCode']}] {body['Text']}"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    tr_srv = ThreadingHTTPServer(("127.0.0.1", 0), TrHandler)
    threading.Thread(target=tr_srv.serve_forever, daemon=True).start()
    fake_translate_server = f"http://127.0.0.1:{tr_srv.server_address[1]}"

    t = fx.element_factory_make("awstranscriber2")
    t.set_property("endpoint-uri", fake_transcribe_server)
    t.set_property("language-code", "en-US")
    pad = t.request_pad("translate_src_%u")
    assert pad.name == "translate_src_0"
    assert t.pad("unsynced_translate_src_0") is not None
    pad.set_property("language-code", "fr")
    pad.set_property("endpoint-uri", fake_translate_server)
    assert pad.get_property("language-code") == "fr"

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    main = fx.element_factory_make("appsink", "main")
    fr = fx.element_factory_make("appsink", "fr")
    un = fx.element_factory_make("appsink", "un")
    p = fx.Pipeline()
    for e in (src, t, main, fr, un):
        p.add(e)
    src.link(t)
    t.pad("src").link(main.pad("sink"))
    pad.link(fr.pad("sink"))
    t.pad("unsynced_src").link(un.pad("sink"))
    src.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16), pts=0))
    src.end_of_stream()
    p.play_until_eos()

    def texts(s):
        return [bytes(np.asarray(x.buffer.data, np.uint8)).decode()
                for x in s.samples]
    assert texts(main) == ["hello 1"]
    assert texts(un) == ["hello 1"]
    assert texts(fr) == ["[fr] hello 1"]
