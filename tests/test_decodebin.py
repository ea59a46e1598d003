"""decodebin + typefind tests: magic detection and auto-plugged chains."""
import io

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.codecs import flac
from gst_plugins_rs_tpu.core.typefind import typefind


class TestTypefind:
    def test_magics(self):
        assert typefind(b"fLaC" + bytes(64)) == "audio/x-flac"
        assert typefind(b"FLV\x01" + bytes(16)) == "video/x-flv"
        assert typefind(b"\x89PNG\r\n\x1a\n" + bytes(8)) == "image/png"
        assert typefind(b"GIF89a" + bytes(8)) == "image/gif"
        assert typefind(b"\xff\xd8\xff\xe0" + bytes(8)) == "image/jpeg"
        assert typefind(b"RIFF\x00\x00\x00\x00WEBP") == "image/webp"
        assert typefind(bytes(4) + b"ftypisom") == "video/quicktime"
        assert typefind(b"Scenarist_SCC V1.0\n") == "application/x-scc"
        assert typefind(b"WEBVTT\n\n") == "application/x-subtitle-vtt"
        ts = b"\x47" + bytes(187)
        assert typefind(ts * 2).startswith("video/mpegts")
        assert typefind(b"\x00\x00\x00\x00") is None


def run_decodebin(data, chunk=None):
    from gst_plugins_rs_tpu.core.parse import parse_caps

    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    dec = fx.element_factory_make("decodebin")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, dec, sink):
        p.add(e)
    src.link(dec)
    dec.link(sink)
    if chunk:
        for i in range(0, len(data), chunk):
            src.push_buffer(fx.Buffer(np.frombuffer(data[i:i + chunk], np.uint8)))
    else:
        src.push_buffer(fx.Buffer(np.frombuffer(data, np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    return sink


class TestDecodeBin:
    def test_flac_autoplug(self):
        t = np.arange(8000)
        pcm = np.stack([(np.sin(t * 0.02) * 9000).astype(np.int64)], 1)
        enc = flac.encode(pcm, rate=8000, bps=16, mode="fixed")
        sink = run_decodebin(enc, chunk=777)
        out = sink.concat_audio()
        assert out.dtype == np.int16
        assert (out == pcm).all()
        assert sink.caps.structure(0).name == "audio/x-raw"

    def test_png_autoplug(self):
        from PIL import Image

        arr = np.zeros((20, 30, 3), np.uint8)
        arr[..., 1] = 200
        bio = io.BytesIO()
        Image.fromarray(arr, "RGB").save(bio, "PNG")
        sink = run_decodebin(bio.getvalue())
        frame = np.asarray(sink.samples[0].buffer.data)
        assert frame.shape[:2] == (20, 30)
        assert (frame[..., 1] == 200).all()

    def test_flv_autoplug_through_mulaw(self):
        """FLV -> rsflvdemux -> (audio/x-mulaw) -> mulawdec, fully auto."""
        import audioop

        from test_image_flv import make_flv

        pcm = (np.sin(np.linspace(0, 30, 240)) * 15000).astype(np.int16)
        ulaw = audioop.lin2ulaw(pcm.tobytes(), 2)
        flv = make_flv([(8, 0, bytes([0x80]) + ulaw)])
        sink = run_decodebin(flv)
        out = sink.concat_audio().ravel()
        ref = np.frombuffer(audioop.ulaw2lin(ulaw, 2), np.int16)
        assert (out == ref).all()
        assert sink.caps.structure(0)["format"] == "S16"

    def test_unknown_stream_exposed_raw(self):
        data = b"\x01\x02\x03\x04" * 2000  # no magic
        sink = run_decodebin(data)
        got = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert got == data

    def test_scc_autoplug(self):
        from gst_plugins_rs_tpu.ops import cea608

        pairs = cea608.encode_pop_on(["VIA DECODEBIN"])
        words = " ".join(f"{hi:02x}{lo:02x}" for hi, lo in pairs)
        scc = f"Scenarist_SCC V1.0\n\n00:00:01:00\t{words}\n\n".encode()
        sink = run_decodebin(scc)
        got = np.asarray(sink.samples[0].buffer.data)
        assert (got == np.asarray(pairs, np.uint8).reshape(-1, 2)).all()


def test_decodebin_negotiates_through_converters():
    """Regression: decoders must not push template-fixated garbage caps at
    link time — a capsfilter after audioconvert used to kill the chain."""
    from gst_plugins_rs_tpu.core.parse import parse_caps
    import tempfile

    t = np.arange(16000)
    pcm = np.stack([(np.sin(t * 0.02) * 12000).astype(np.int64)] * 2, 1)
    path = tempfile.mktemp(suffix=".flac")
    open(path, "wb").write(flac.encode(pcm, rate=48000, bps=16, mode="fixed"))
    p = fx.parse_launch(
        f"uriplaylistbin uris=file://{path} ! decodebin ! audioconvert "
        "! audio/x-raw,format=F32,rate=48000,channels=2 ! appsink name=sink"
    )
    p.play_until_eos()
    out = p.by_name("sink").concat_audio()
    assert out.shape == (16000, 2)
    assert out.dtype == np.float32
    assert np.abs(out * 32768.0 - pcm).max() <= 1.0
