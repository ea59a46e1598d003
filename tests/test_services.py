"""Speech-service elements against in-process fake servers."""
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps

from websockets.sync.server import serve as ws_serve


def _ws_server(handler):
    srv = ws_serve(handler, "127.0.0.1", 0)
    port = srv.socket.getsockname()[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"ws://127.0.0.1:{port}"


def _audio_to_text_pipeline(el):
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, el, sink)
    src.link(el)
    el.link(sink)
    return p, src, sink


def test_deepgram_transcriber():
    seen = {"auth": None, "query": None, "audio": 0}

    def handler(ws):
        seen["auth"] = ws.request.headers.get("Authorization")
        seen["query"] = ws.request.path
        n = 0
        for raw in ws:
            if isinstance(raw, str):
                msg = json.loads(raw)
                if msg.get("type") == "CloseStream":
                    break
                continue
            seen["audio"] += len(raw)
            n += 1
            ws.send(json.dumps({
                "type": "Results", "is_final": False,
                "channel": {"alternatives": [{"transcript": "par"}]},
            }))
            ws.send(json.dumps({
                "type": "Results", "is_final": True,
                "channel": {"alternatives": [{"transcript": f"final {n}"}]},
            }))

    srv, uri = _ws_server(handler)
    try:
        el = fx.element_factory_make("deepgramtranscriber")
        el.set_property("url", uri)
        el.set_property("api-key", "dg-key")
        el.set_property("language", "de")
        p, src, sink = _audio_to_text_pipeline(el)
        for _ in range(3):
            src.push_buffer(fx.Buffer(np.zeros((800, 1), np.int16)))
        src.end_of_stream()
        p.play_until_eos()
        texts = [bytes(np.asarray(s.buffer.data, np.uint8)).decode() for s in sink.samples]
        assert texts and texts == [f"final {i+1}" for i in range(len(texts))]
        assert seen["auth"] == "Token dg-key"
        assert "encoding=linear16" in seen["query"] and "language=de" in seen["query"]
        assert seen["audio"] == 3 * 1600
    finally:
        srv.shutdown()


def test_speechmatics_transcriber():
    protocol = []

    def handler(ws):
        seq = 0
        for raw in ws:
            if isinstance(raw, bytes):
                seq += 1
                ws.send(json.dumps({"message": "AudioAdded", "seq_no": seq}))
                ws.send(json.dumps({
                    "message": "AddTranscript",
                    "results": [
                        {"start_time": 0.0, "end_time": 0.5,
                         "alternatives": [{"content": "hallo"}]},
                        {"start_time": 0.5, "end_time": 0.9,
                         "alternatives": [{"content": f"welt{seq}"}]},
                    ],
                }))
                continue
            msg = json.loads(raw)
            protocol.append(msg["message"])
            if msg["message"] == "StartRecognition":
                assert msg["audio_format"]["encoding"] == "pcm_s16le"
                ws.send(json.dumps({"message": "RecognitionStarted", "id": "x"}))
            elif msg["message"] == "EndOfStream":
                protocol.append(("last_seq", msg["last_seq_no"]))
                ws.send(json.dumps({"message": "EndOfTranscript"}))
                break

    srv, uri = _ws_server(handler)
    try:
        el = fx.element_factory_make("speechmaticstranscriber")
        el.set_property("url", uri)
        p, src, sink = _audio_to_text_pipeline(el)
        for _ in range(2):
            src.push_buffer(fx.Buffer(np.zeros((800, 1), np.int16)))
        src.end_of_stream()
        p.play_until_eos()
        texts = [bytes(np.asarray(s.buffer.data, np.uint8)).decode() for s in sink.samples]
        assert texts[0] == "hallo welt1"
        assert "StartRecognition" in protocol
        assert ("last_seq", 2) in protocol
    finally:
        srv.shutdown()


def test_elevenlabs_synthesizer():
    inits = []

    def handler(ws):
        for raw in ws:
            msg = json.loads(raw)
            if "voice_settings" in msg:
                inits.append(msg)
                continue
            text = msg.get("text", "")
            if not text:
                break
            pcm = (np.ones(50, "<i2") * len(text)).tobytes()
            ws.send(json.dumps({"audio": base64.b64encode(pcm).decode(),
                                "isFinal": False}))

    srv, uri = _ws_server(handler)
    try:
        el = fx.element_factory_make("elevenlabssynthesizer")
        el.set_property("url", uri)
        el.set_property("api-key", "xi-key")
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, el, sink)
        src.link(el)
        el.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(b"hello there", np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert sink.samples
        audio = np.asarray(sink.samples[0].buffer.data)
        assert audio.shape == (50, 1)
        assert int(audio[0, 0]) == len("hello there")
        assert inits and inits[0]["xi_api_key"] == "xi-key"
        s = sink.samples[0].caps.structure(0)
        assert s.get("rate") == 16000
    finally:
        srv.shutdown()


def test_elevenlabs_voicecloner():
    posts = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            posts.append((self.path, self.headers.get("xi-api-key"), body))
            out = json.dumps({"voice_id": "voice-xyz"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        el = fx.element_factory_make("elevenlabsvoicecloner")
        el.set_property("url", f"http://127.0.0.1:{srv.server_address[1]}")
        el.set_property("api-key", "xi-key")
        el.set_property("voice-name", "tpu-voice")
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps(
            "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
        p = fx.Pipeline()
        p.add(src, el)
        src.link(el)
        src.push_buffer(fx.Buffer(np.ones((1600, 1), np.int16)))
        src.end_of_stream()
        p.play_until_eos()
        assert el.voice_id == "voice-xyz"
        path, key, body = posts[0]
        assert path == "/v1/voices/add" and key == "xi-key"
        assert b'name="name"' in body and b"tpu-voice" in body
        assert b'filename="sample000.raw"' in body
    finally:
        srv.shutdown()


def test_llamacpp_gating_and_fallback():
    el = fx.element_factory_make("llamacpp-texttransform")
    with pytest.raises(RuntimeError):
        el.start()
    el2 = fx.element_factory_make("llamacpp-texttransform")
    el2.set_property("allow-echo-fallback", True)
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src, el2, sink)
    src.link(el2)
    el2.link(sink)
    src.push_buffer(fx.Buffer(np.frombuffer(b"question", np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    assert bytes(np.asarray(sink.samples[0].buffer.data, np.uint8)) == b"QUESTION"


def test_brotli_stored_block_roundtrip():
    from gst_plugins_rs_tpu.codecs import brotli
    for payload in (b"", b"x", b"hello brotli " * 1000, bytes(range(256)) * 300):
        if not payload:
            # empty input -> just the last-empty metablock
            stream = brotli._compress_stored(payload)
            assert brotli.decompress(stream) == payload
            continue
        stream = brotli._compress_stored(payload)
        # the stored-subset stream decodes via BOTH the C library and the
        # pure-python subset decoder
        assert brotli.decompress(stream) == payload
        assert brotli._decompress_subset(stream) == payload
        # stored blocks add only headers: overhead stays tiny
        assert len(stream) < len(payload) + 64


def test_brotli_full_rfc7932():
    """Full entropy-coded RFC 7932 via the system C library (the same
    external-library route the reference takes with the brotli crate)."""
    import pytest as _pytest

    from gst_plugins_rs_tpu.codecs import brotli

    if not brotli._load_libs():
        _pytest.skip("libbrotli unavailable")
    import os as _os
    for payload in (b"a" * 100000, b"the quick brown fox " * 2000,
                    _os.urandom(5000), b""):
        stream = brotli.compress(payload)
        assert brotli.decompress(stream) == payload
    # compressible data actually compresses (entropy coding engaged)
    assert len(brotli.compress(b"abc" * 10000)) < 200


def test_brotli_elements():
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    enc = fx.element_factory_make("brotlicompress")
    dec = fx.element_factory_make("brotlidecompress")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, enc, dec, sink):
        p.add(e)
    src.link(enc)
    enc.link(dec)
    dec.link(sink)
    payload = b"roundtrip" * 500
    src.push_buffer(fx.Buffer(np.frombuffer(payload, np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    assert bytes(np.asarray(sink.samples[0].buffer.data, np.uint8)) == payload


def test_transcriber_json_output_negotiation():
    """Reference transcribers offer text AND application/x-json; when
    downstream negotiates JSON the transcripts come as line records that
    tttocea608's JSON input consumes directly."""
    import json as _json

    el = fx.element_factory_make("deepgramtranscriber")
    el.out_caps = parse_caps("application/x-json")
    el._results.append("hello world")
    el._last_pts = 0
    buf = el.generate_output()
    rec = _json.loads(bytes(np.asarray(buf.data, np.uint8)).decode())
    assert rec == {"lines": [{"text": "hello world"}]}


def test_elevenlabs_voicecloner_passes_audio_through():
    """The cloner sits mid-pipeline like the reference: audio passes
    through on src while being collected for the clone upload."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            out = json.dumps({"voice_id": "v"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    el = fx.element_factory_make("elevenlabsvoicecloner")
    el.set_property("url", f"http://127.0.0.1:{srv.server_address[1]}")
    src = fx.element_factory_make("audiotestsrc")
    src.set_property("num-buffers", 5)
    src.set_property("samplesperbuffer", 480)
    sink = fx.element_factory_make("appsink")
    pipe = fx.Pipeline()
    for e in (src, el, sink):
        pipe.add(e)
    src.link(el); el.link(sink)
    pipe.play_until_eos()
    assert len(sink.samples) == 5  # passthrough on src
    assert sink.samples[0].buffer.pts == 0
    n_ch = np.asarray(sink.samples[0].buffer.data).shape[-1]
    assert len(el._audio) == 5 * 480 * n_ch * 2  # collected as s16


def test_speechmatics_translate_pads():
    """Requested translate pads feed translation_config.target_languages
    and AddTranslation results route to the matching pad (speechmatics
    transcriber/imp.rs:1266-1292)."""
    from websockets.sync.server import serve as ws_serve

    def handler(ws):
        n = 0
        for raw in ws:
            if isinstance(raw, bytes):
                n += 1
                ws.send(json.dumps({"message": "AddTranscript", "results": [
                    {"type": "word",
                     "alternatives": [{"content": f"word{n}"}]}]}))
                ws.send(json.dumps({"message": "AddTranslation",
                                    "language": "fr",
                                    "results": [{"start_time": 0.0,
                                                 "end_time": 1.0,
                                                 "content": f"mot{n}"}]}))
                continue
            msg = json.loads(raw)
            if msg.get("message") == "StartRecognition":
                assert msg["translation_config"]["target_languages"] == ["fr"]
                ws.send(json.dumps({"message": "RecognitionStarted"}))
            elif msg.get("message") == "EndOfStream":
                ws.send(json.dumps({"message": "EndOfTranscript"}))

    srv = ws_serve(handler, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    el = fx.element_factory_make("speechmaticstranscriber")
    el.set_property("url", f"ws://127.0.0.1:{srv.socket.getsockname()[1]}")
    pad = el.request_pad("translate_src_%u")
    pad.set_property("language-code", "fr")
    assert el.pad("unsynced_translate_src_0") is not None

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    main = fx.element_factory_make("appsink", "m")
    frs = fx.element_factory_make("appsink", "f")
    uns = fx.element_factory_make("appsink", "u")
    p = fx.Pipeline()
    for e in (src, el, main, frs, uns):
        p.add(e)
    src.link(el)
    el.pad("src").link(main.pad("sink"))
    el.pad("unsynced_src").link(uns.pad("sink"))
    pad.link(frs.pad("sink"))
    for _ in range(2):
        src.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16), pts=0))
    src.end_of_stream()
    p.play_until_eos()

    def texts(s):
        return [bytes(np.asarray(x.buffer.data, np.uint8)).decode()
                for x in s.samples]
    assert texts(main) and texts(main)[0] == "word1"
    assert texts(frs) and texts(frs)[0] == "mot1"
    assert texts(uns) == texts(main)  # raw transcript mirror
