"""Container output validated by the SYSTEM libavformat — an external oracle.

Every other mux test asserts against the in-repo reader (mux/reader.py,
mux/mpegts.py), written by the same hand as the writers: a shared
misreading of ISO 14496-12 / H.222.0 would be invisible there.  These
tests route the muxers' actual output bytes through ffmpeg's demuxers
(and, for AV1, its decoder) — code that never saw this repo — matching
the confidence level of the reference's mux tests, which drive output
through real GStreamer demuxers/decoders
(mux/isobmff/tests/tests_fmp4.rs).

Skipped when the native avshim can't build (no system ffmpeg libs).
"""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.codecs import avlib

pytestmark = pytest.mark.skipif(
    not avlib.available(), reason="system libavformat shim unavailable")

SRC_AUDIO = (
    "audiotestsrc wave=sine num-buffers=20 samplesperbuffer=4800 "
    "! audio/x-raw,format=F32,rate=48000,channels=2 "
)


def mux_to_file(desc: str, path) -> str:
    p = fx.parse_launch(desc)
    p.play_until_eos()
    data = b"".join(
        np.asarray(s.buffer.data).tobytes()
        for s in p.by_name("sink").samples)
    path.write_bytes(data)
    return str(path)


def source_audio_bytes() -> bytes:
    p = fx.parse_launch(SRC_AUDIO + "! appsink name=sink")
    p.play_until_eos()
    return p.by_name("sink").concat_audio().astype(np.float32).tobytes()


class TestFmp4ExternalOracle:
    @pytest.mark.parametrize("muxer", ["cmafmux", "isofmp4mux"])
    def test_fragmented_audio_demuxes(self, tmp_path, muxer):
        f = mux_to_file(
            SRC_AUDIO + f"! {muxer} fragment-duration=500000000 "
            "! appsink name=sink", tmp_path / "frag.mp4")
        d = avlib.Demuxer(f)
        assert "mp4" in d.format_name
        assert d.nb_streams == 1
        info = d.stream_info(0)
        assert info["type"] == "audio"
        assert info["sample_rate"] == 48000 and info["channels"] == 2
        # ffmpeg must recover the exact PCM payload bytes, in order, with a
        # contiguous 48 kHz pts timeline
        pkts = list(d.packets())
        assert pkts, "no packets demuxed"
        payload = b"".join(x["data"] for x in pkts)
        assert payload == source_audio_bytes()
        # pts timeline: starts at 0, strictly increasing, and the last pts
        # plus its sample span lands on 2 s (time_base is 1/48000)
        num, den = info["time_base"]
        assert den == 48000 and num == 1
        pts = [x["pts"] for x in pkts]
        assert pts[0] == 0
        assert all(b > a for a, b in zip(pts, pts[1:]))
        last_samples = len(pkts[-1]["data"]) // (2 * 4)  # 2ch f32
        assert pts[-1] + last_samples == 96000  # 2 s @ 48 kHz
        # external duration agrees: 2 s (AV_TIME_BASE us)
        assert d.duration_us == pytest.approx(2_000_000, abs=1_000)

    def test_plain_mp4_demuxes(self, tmp_path):
        f = mux_to_file(
            SRC_AUDIO + "! isomp4mux ! appsink name=sink",
            tmp_path / "plain.mp4")
        d = avlib.Demuxer(f)
        assert "mp4" in d.format_name
        payload = b"".join(x["data"] for x in d.packets())
        assert payload == source_audio_bytes()

    def test_av1_video_track_decodes(self, tmp_path):
        """AV1 video through rav1enc -> isomp4mux, then libavformat demux
        AND libavcodec/dav1d decode — a full independent read of both the
        container and the av01/av1C sample entry."""
        w, h, n = 128, 96, 5
        src = fx.element_factory_make("appsrc")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src.set_property("caps", parse_caps(
            f"video/x-raw,format=I420,width={w},height={h},framerate=30/1"))
        enc = fx.element_factory_make("rav1enc")
        enc.set_property("speed-preset", 10)
        mux = fx.element_factory_make("isomp4mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, mux, sink):
            p.add(e)
        src.link(enc)
        enc.pad("src").link(mux.request_sink_pad())
        mux.pad("src").link(sink.pad("sink"))
        rng = np.random.default_rng(0)
        luma = []
        for i in range(n):
            y = np.full((h, w), 40 + 30 * i, np.uint8)
            u = np.full((h // 2, w // 2), 128, np.uint8)
            v = np.full((h // 2, w // 2), 128, np.uint8)
            luma.append(40 + 30 * i)
            src.push_buffer(fx.Buffer((y, u, v), pts=i * 33_333_333,
                                      duration=33_333_333))
        src.end_of_stream()
        p.play_until_eos()
        f = tmp_path / "av1.mp4"
        f.write_bytes(b"".join(
            np.asarray(s.buffer.data).tobytes() for s in sink.samples))

        d = avlib.Demuxer(str(f))
        info = d.stream_info(0)
        assert info["type"] == "video"
        assert info["codec"] == "av1"
        assert (info["width"], info["height"]) == (w, h)
        pkts = list(d.packets())
        assert len(pkts) == n
        assert pkts[0]["keyframe"]
        # decode the demuxed packets with the system dav1d and check the
        # luma ramp came through (quantized, so wide tolerance)
        dec = avlib.VideoDecoder("libdav1d", info["extradata"])
        frames = []
        for x in pkts:
            frames += dec.decode(x["data"], x["pts"])
        frames += dec.decode(None)
        assert len(frames) == n
        for (y, _u, _v, _pts), expect in zip(frames, luma):
            assert abs(float(y.mean()) - expect) < 12


class TestMpegTsExternalOracle:
    def test_klv_ts_demuxes(self, tmp_path):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-klv,parsed=true"))
        mux = fx.element_factory_make("mpegtsmux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, mux, sink):
            p.add(e)
        src.pad("src").link(mux.request_sink_pad())
        mux.pad("src").link(sink.pad("sink"))
        payloads = [bytes([i]) * 150 for i in range(4)]
        for i, pl in enumerate(payloads):
            src.push_buffer(fx.Buffer(np.frombuffer(pl, np.uint8),
                                      pts=i * 10**9))
        src.end_of_stream()
        p.play_until_eos()
        f = tmp_path / "klv.ts"
        f.write_bytes(b"".join(
            np.asarray(s.buffer.data).tobytes() for s in sink.samples))

        d = avlib.Demuxer(str(f))
        assert d.format_name == "mpegts"
        assert d.nb_streams == 1
        got = b"".join(x["data"] for x in d.packets())
        for pl in payloads:
            assert pl in got, "KLV unit lost in TS carriage"


class TestHlsExternalOracle:
    def test_hls_segments_demux(self, tmp_path):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=40 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! hlscmafsink name=sink target-duration=1 "
            f"playlist-location={tmp_path}/media.m3u8 "
            f"init-location={tmp_path}/init%05d.mp4 "
            f"location={tmp_path}/seg%05d.m4s")
        p.play_until_eos()
        segs = sorted(tmp_path.glob("seg*.m4s"))
        assert len(segs) == 4  # 4 s at 1 s target
        init = (tmp_path / "init00000.mp4").read_bytes()
        # every segment, prefixed by the init segment, must demux cleanly
        # and the union must recover the whole PCM stream
        payload = b""
        for seg in segs:
            joined = tmp_path / (seg.name + ".joined.mp4")
            joined.write_bytes(init + seg.read_bytes())
            d = avlib.Demuxer(str(joined))
            assert "mp4" in d.format_name
            pkts = list(d.packets())
            assert pkts
            payload += b"".join(x["data"] for x in pkts)
        p2 = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=40 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! appsink name=sink")
        p2.play_until_eos()
        assert payload == p2.by_name("sink").concat_audio().astype(
            np.float32).tobytes()
