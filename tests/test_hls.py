"""HLS sink tests: playlist writer, hlscmafsink end-to-end (segments
re-parsed with the independent BMFF reader), sliding window, webvtt and
multivariant sinks."""
import os


import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.mux import reader
from gst_plugins_rs_tpu.net import hls


class TestPlaylist:
    def test_render_basic(self):
        pl = hls.MediaPlaylist(target_duration=4, init_uri="init.mp4")
        pl.add_segment(hls.Segment("seg0.m4s", 4.0))
        pl.add_segment(hls.Segment("seg1.m4s", 3.5))
        pl.end()
        text = pl.render()
        assert text.startswith("#EXTM3U\n")
        assert "#EXT-X-VERSION:6" in text
        assert '#EXT-X-MAP:URI="init.mp4"' in text
        assert "#EXTINF:4.000,\nseg0.m4s" in text
        assert text.rstrip().endswith("#EXT-X-ENDLIST")

    def test_sliding_window_and_eviction(self):
        pl = hls.MediaPlaylist(target_duration=1, playlist_length=2, max_files=3)
        evicted = []
        for i in range(5):
            evicted += pl.add_segment(hls.Segment(f"s{i}", 1.0, path=f"/tmp/s{i}"))
        text = pl.render()
        assert "s3" in text and "s4" in text and "s2" not in text
        assert "#EXT-X-MEDIA-SEQUENCE:3" in text
        assert evicted == ["/tmp/s0", "/tmp/s1"]

    def test_master_playlist(self):
        text = hls.master_playlist(
            [hls.Variant("v0.m3u8", 2_000_000, 1920, 1080, "avc1.64001f"),
             hls.Variant("v1.m3u8", 500_000)]
        )
        assert "#EXT-X-STREAM-INF:BANDWIDTH=2000000,RESOLUTION=1920x1080" in text
        assert 'CODECS="avc1.64001f"' in text
        assert text.rstrip().endswith("v1.m3u8")


class TestHlsCmafSink:
    def test_end_to_end(self, tmp_path):
        os.chdir(tmp_path)
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=40 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! hlscmafsink name=sink target-duration=1 "
            f"playlist-location={tmp_path}/media.m3u8 "
            f"init-location={tmp_path}/init%05d.mp4 "
            f"location={tmp_path}/seg%05d.m4s"
        )
        p.play_until_eos()
        # 4 s of audio at 1 s target -> 4 segments
        segs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".m4s"))
        assert len(segs) == 4
        init = (tmp_path / "init00000.mp4").read_bytes()
        assert reader.box_types(init) == ["ftyp", "moov"]
        # segments parse as moof+mdat and carry 1 s each
        total = 0
        for s in segs:
            data = (tmp_path / s).read_bytes()
            assert reader.box_types(data) == ["moof", "mdat"]
            frags = reader.decode_fragments(init + data)
            total += sum(sum(f.sample_durations) for f in frags)
        assert total == 40 * 4800
        playlist = (tmp_path / "media.m3u8").read_text()
        assert '#EXT-X-MAP:URI="init00000.mp4"' in playlist
        assert playlist.count("#EXTINF:") == 4
        assert "#EXT-X-ENDLIST" in playlist
        msgs = [m for m in p.bus.messages()
                if m.structure and m.structure.name == "hls-segment-added"]
        assert len(msgs) == 4

    def test_segment_window_eviction(self, tmp_path):
        os.chdir(tmp_path)
        p = fx.parse_launch(
            "audiotestsrc wave=silence num-buffers=60 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! hlscmafsink target-duration=1 max-files=3 playlist-length=2 "
            f"playlist-location={tmp_path}/media.m3u8 "
            f"init-location={tmp_path}/init%05d.mp4 "
            f"location={tmp_path}/seg%05d.m4s"
        )
        p.play_until_eos()
        segs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".m4s"))
        assert len(segs) == 3  # older files deleted past max-files
        playlist = (tmp_path / "media.m3u8").read_text()
        assert playlist.count("#EXTINF:") == 2  # window of playlist-length


class TestHlsSink3:
    def test_segment_premuxed_stream(self, tmp_path):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=20 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! cmafmux fragment-duration=1000000000 "
            f"! hlssink3 playlist-location={tmp_path}/p.m3u8 "
            f"init-location={tmp_path}/init%05d.mp4 "
            f"location={tmp_path}/seg%05d.ts"
        )
        p.play_until_eos()
        segs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ts"))
        assert len(segs) == 2
        assert (tmp_path / "init00000.mp4").exists()
        text = (tmp_path / "p.m3u8").read_text()
        assert text.count("#EXTINF:") == 2


class TestHlsWebVtt:
    def test_vtt_segments(self, tmp_path):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        tojson = fx.element_factory_make("tttojson")
        tovtt = fx.element_factory_make("jsontovtt")
        sink = fx.element_factory_make("hlswebvttsink")
        sink.set_property("playlist-location", str(tmp_path / "subs.m3u8"))
        sink.set_property("location", str(tmp_path / "sub%05d.vtt"))
        p = fx.Pipeline()
        for e in (src, tojson, tovtt, sink):
            p.add(e)
        src.link(tojson); tojson.link(tovtt); tovtt.link(sink)
        src.push_buffer(fx.Buffer("hello", pts=0, duration=2_000_000_000))
        src.push_buffer(fx.Buffer("world", pts=2_000_000_000, duration=2_000_000_000))
        src.end_of_stream()
        p.play_until_eos()
        assert (tmp_path / "sub00000.vtt").read_text().startswith("WEBVTT")
        assert "world" in (tmp_path / "sub00001.vtt").read_text()
        assert (tmp_path / "subs.m3u8").read_text().count("#EXTINF:") == 2


class TestMultivariant:
    def test_master_and_variants(self, tmp_path):
        mv = fx.element_factory_make("hlsmultivariantsink")
        mv.set_property("playlist-location", str(tmp_path / "master.m3u8"))
        mv.set_property("variant-playlist-pattern", str(tmp_path / "variant%u.m3u8"))
        mv.set_property("segment-pattern", str(tmp_path / "v%u_seg%%05d.m4s"))
        mv.set_property("target-duration", 1)

        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        p.add(mv)
        for rate in (48000, 24000):
            src = fx.element_factory_make("audiotestsrc")
            src.set_property("wave", "sine")
            src.set_property("num-buffers", 20)
            src.set_property("samplesperbuffer", rate // 10)
            capsf = fx.element_factory_make("capsfilter")
            capsf.set_property(
                "caps", parse_caps(f"audio/x-raw,format=F32,rate={rate},channels=1")
            )
            mux = fx.element_factory_make("cmafmux")
            mux.set_property("fragment-duration", 1_000_000_000)
            for e in (src, capsf, mux):
                p.add(e)
            src.link(capsf)
            capsf.link(mux)
            mux.srcpad.link(mv.request_sink_pad(bandwidth=rate * 32))
        p.play_until_eos()
        master = (tmp_path / "master.m3u8").read_text()
        assert master.count("#EXT-X-STREAM-INF:") == 2
        assert (tmp_path / "variant0.m3u8").exists()
        assert (tmp_path / "variant1.m3u8").exists()
        v0 = (tmp_path / "variant0.m3u8").read_text()
        assert v0.count("#EXTINF:") == 2
