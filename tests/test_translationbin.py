"""translationbin: transcribe + per-pad translation, plus the compress and
onvif factory aliases."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net import eventstream


def test_compress_aliases_roundtrip():
    for enc_name, dec_name in (("zlibcompress", "zlibdecompress"),
                               ("deflatecompress", "deflatedecompress")):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        enc = fx.element_factory_make(enc_name)
        dec = fx.element_factory_make(dec_name)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dec, sink):
            p.add(e)
        src.link(enc)
        enc.link(dec)
        dec.link(sink)
        payload = b"compressible " * 100
        src.push_buffer(fx.Buffer(np.frombuffer(payload, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert bytes(np.asarray(sink.samples[0].buffer.data, np.uint8)) == payload


def test_onvif_rtp_aliases():
    assert fx.element_factory_make("rtponvifmetadatapay") is not None
    assert fx.element_factory_make("rtponvifmetadatadepay") is not None


@pytest.fixture()
def fake_services():
    """Fake Transcribe WS + fake Translate REST in one fixture."""
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
                {"IsPartial": False, "Alternatives": [{"Transcript": f"hello {n}"}]},
            ]}}).encode()
            ws.send(eventstream.encode_message(
                {":message-type": "event", ":event-type": "TranscriptEvent"}, out))

    ts_srv = ws_serve(ts_handler, "127.0.0.1", 0)
    ts_port = ts_srv.socket.getsockname()[1]
    threading.Thread(target=ts_srv.serve_forever, daemon=True).start()

    class TranslateHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            out = json.dumps({
                "TranslatedText": f"[{body['TargetLanguageCode']}] {body['Text']}",
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    tr_srv = ThreadingHTTPServer(("127.0.0.1", 0), TranslateHandler)
    threading.Thread(target=tr_srv.serve_forever, daemon=True).start()
    yield (f"ws://127.0.0.1:{ts_port}",
           f"http://127.0.0.1:{tr_srv.server_address[1]}")
    ts_srv.shutdown()
    tr_srv.shutdown()


def test_translationbin_two_languages(fake_services):
    ts_uri, tr_uri = fake_services
    tb = fx.element_factory_make("translationbin")
    tb.set_property("transcriber", "awstranscriber2")
    tb.set_property("transcriber::endpoint-uri", ts_uri)
    tb.set_property("language-code", "en-US")

    pad_en = tb.request_src_pad(language_code="en-US")
    pad_es = tb.request_src_pad(language_code="es-ES",
                                translator_props={"endpoint-uri": tr_uri,
                                                  "access-key": "AKID",
                                                  "secret-access-key": "sec"})

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    sink_en = fx.element_factory_make("appsink", "en")
    sink_es = fx.element_factory_make("appsink", "es")
    p = fx.Pipeline()
    for e in (src, tb, sink_en, sink_es):
        p.add(e)
    src.link(tb)
    pad_en.link(sink_en.pad("sink"))
    pad_es.link(sink_es.pad("sink"))

    for _ in range(3):
        src.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16)))
    src.end_of_stream()
    p.play_until_eos()

    en = [bytes(np.asarray(s.buffer.data, np.uint8)).decode() for s in sink_en.samples]
    es = [bytes(np.asarray(s.buffer.data, np.uint8)).decode() for s in sink_es.samples]
    assert en and en[0] == "hello 1"
    assert es and es[0] == "[es] hello 1"
    assert len(en) == len(es)


def test_translationbin_passthrough_src_and_pad_names(fake_services):
    """The always src pad carries the untranslated transcript; request
    pads are named translate_src_%u like the reference."""
    ts_uri, tr_uri = fake_services
    tb = fx.element_factory_make("translationbin")
    tb.set_property("transcriber", "awstranscriber2")
    tb.set_property("transcriber::endpoint-uri", ts_uri)
    tb.set_property("language-code", "en-US")
    pad_es = tb.request_src_pad(language_code="es-ES",
                                translator_props={"endpoint-uri": tr_uri,
                                                  "access-key": "AKID",
                                                  "secret-access-key": "sec"})
    assert pad_es.name == "translate_src_0"

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    sink_pass = fx.element_factory_make("appsink", "pass")
    sink_es = fx.element_factory_make("appsink", "es2")
    p = fx.Pipeline()
    for e in (src, tb, sink_pass, sink_es):
        p.add(e)
    src.link(tb)
    tb.pad("src").link(sink_pass.pad("sink"))
    pad_es.link(sink_es.pad("sink"))
    for _ in range(2):
        src.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16)))
    src.end_of_stream()
    p.play_until_eos()
    texts = [bytes(np.asarray(s.buffer.data, np.uint8)).decode()
             for s in sink_pass.samples]
    es = [bytes(np.asarray(s.buffer.data, np.uint8)).decode()
          for s in sink_es.samples]
    assert texts and texts[0] == "hello 1"  # untranslated passthrough
    assert es and es[0] == "[es] hello 1"


def test_transcriberbin_unsynced_src(fake_services):
    """unsynced_src carries raw transcripts straight off the transcriber,
    before caption encoding (transcriberbin/imp.rs unsynced pads)."""
    ts_uri, _ = fake_services
    tb = fx.element_factory_make("transcriberbin")
    tb.set_property("transcriber", "awstranscriber2")
    tb.set_property("transcriber::endpoint-uri", ts_uri)
    asrc = fx.element_factory_make("appsrc", "a")
    asrc.set_property("caps", parse_caps(
        "audio/x-raw,format=S16,rate=16000,channels=1,layout=interleaved"))
    vsrc = fx.element_factory_make("appsrc", "v")
    vsrc.set_property("caps", parse_caps(
        "video/x-raw,format=RGB,width=8,height=8,framerate=30/1"))
    vsink = fx.element_factory_make("appsink", "vs")
    asink = fx.element_factory_make("appsink", "as")
    usink = fx.element_factory_make("appsink", "us")
    p = fx.Pipeline()
    for e in (asrc, vsrc, tb, vsink, asink, usink):
        p.add(e)
    asrc.pad("src").link(tb.pad("sink_audio"))
    vsrc.pad("src").link(tb.pad("sink_video"))
    tb.pad("src_video").link(vsink.pad("sink"))
    tb.pad("src_audio").link(asink.pad("sink"))
    tb.pad("unsynced_src").link(usink.pad("sink"))
    for i in range(2):
        asrc.push_buffer(fx.Buffer(np.zeros((1600, 1), np.int16), pts=i * 10**8))
        vsrc.push_buffer(fx.Buffer(np.zeros((8, 8, 3), np.uint8), pts=i * 10**8,
                                   duration=10**8))
    asrc.end_of_stream(); vsrc.end_of_stream()
    p.play_until_eos()
    texts = [bytes(np.asarray(s.buffer.data, np.uint8)).decode()
             for s in usink.samples]
    assert texts and texts[0] == "hello 1"
    assert len(vsink.samples) == 2  # video still passes with captions
