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


class TestMultivariantRenditions:
    """Reference scenarios: hlsmultivariantsink/tests/hlsmultivariantsink.rs
    (audio renditions x video variants, muxed A/V, relative paths,
    validation)."""

    @staticmethod
    def _audio_chain(p, rate):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        src = fx.element_factory_make("audiotestsrc")
        src.set_property("num-buffers", 10)
        src.set_property("samplesperbuffer", rate // 10)
        capsf = fx.element_factory_make("capsfilter")
        capsf.set_property("caps", parse_caps(
            f"audio/x-raw,format=F32,rate={rate},channels=1"))
        mux = fx.element_factory_make("cmafmux")
        mux.set_property("fragment-duration", 500_000_000)
        for e in (src, capsf, mux):
            p.add(e)
        src.link(capsf)
        capsf.link(mux)
        return mux

    def _build(self, tmp_path, muxer_type="cmaf"):
        mv = fx.element_factory_make("hlsmultivariantsink")
        mv.set_property("multivariant-playlist-location",
                        str(tmp_path / "multivariant.m3u8"))
        mv.set_property("target-duration", 1)
        mv.set_property("muxer-type", muxer_type)
        return mv

    def test_audio_renditions_and_video_variants(self, tmp_path):
        p = fx.Pipeline()
        mv = self._build(tmp_path)
        p.add(mv)
        # two audio renditions in group "aac"
        for i, (name, lang, default) in enumerate(
                [("English", "en", True), ("French", "fr", False)]):
            pad = mv.request_pad("audio_%u")
            pad.set_property("alternate-rendition", {
                "media_type": "audio", "uri": f"{lang}/audio.m3u8",
                "group_id": "aac", "name": name, "language": lang,
                "default": default, "autoselect": True,
            })
            self._audio_chain(p, 48000).srcpad.link(pad)
        # two video variants referencing the audio group
        for i, bw in enumerate([2_000_000, 500_000]):
            pad = mv.request_pad("video_%u")
            pad.set_property("variant", {
                "uri": f"v{i}/video.m3u8", "bandwidth": bw,
                "codecs": "avc1.64001f", "audio": "aac",
            })
            self._audio_chain(p, 24000).srcpad.link(pad)
        p.play_until_eos()

        master = (tmp_path / "multivariant.m3u8").read_text()
        assert master.splitlines()[1] == "#EXT-X-VERSION:6"
        assert master.count("#EXT-X-MEDIA:") == 2
        assert ('#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aac",NAME="English",'
                'LANGUAGE="en",DEFAULT=YES,AUTOSELECT=YES,URI="en/audio.m3u8"'
                ) in master
        assert 'DEFAULT=NO,AUTOSELECT=YES,URI="fr/audio.m3u8"' in master
        assert master.count("#EXT-X-STREAM-INF:") == 2
        assert ('#EXT-X-STREAM-INF:BANDWIDTH=2000000,CODECS="avc1.64001f",'
                'AUDIO="aac"\nv0/video.m3u8') in master
        # every rendition/variant got its own media playlist + segments
        for sub in ("en/audio", "fr/audio", "v0/video", "v1/video"):
            text = (tmp_path / f"{sub}.m3u8").read_text()
            assert "#EXTINF:" in text
        assert (tmp_path / "v0").is_dir() and any(
            f.endswith(".m4s") for f in os.listdir(tmp_path / "v0"))

    def test_muxed_audio_video_variant_shares_sink(self, tmp_path):
        """Same uri on an audio and a video pad = muxed variant: one inner
        sink, one STREAM-INF entry (imp.rs:829-838)."""
        p = fx.Pipeline()
        mv = self._build(tmp_path, muxer_type="mpegts")
        p.add(mv)
        vpad = mv.request_pad("video_%u")
        vpad.set_property("variant", {"uri": "av/stream.m3u8",
                                      "bandwidth": 1_000_000})
        apad = mv.request_pad("audio_%u")
        apad.set_property("variant", {"uri": "av/stream.m3u8",
                                      "bandwidth": 1_000_000})
        assert vpad.sink is apad.sink
        assert len(mv._sinks) == 1
        self._audio_chain(p, 48000).srcpad.link(vpad)
        p.play_until_eos()
        master = (tmp_path / "multivariant.m3u8").read_text()
        assert master.splitlines()[1] == "#EXT-X-VERSION:4"  # mpegts
        assert master.count("#EXT-X-STREAM-INF:") == 1
        assert any(f.endswith(".ts") for f in os.listdir(tmp_path / "av"))

    def test_validation_rejects_unmatched_group(self, tmp_path):
        mv = self._build(tmp_path)
        pad = mv.request_pad("audio_%u")
        pad.set_property("alternate-rendition", {
            "uri": "en/a.m3u8", "group_id": "aac", "name": "English"})
        vpad = mv.request_pad("video_%u")
        vpad.set_property("variant", {"uri": "v0/v.m3u8", "bandwidth": 1,
                                      "audio": "other-group"})
        import pytest
        from gst_plugins_rs_tpu.core.element import State
        with pytest.raises(ValueError, match="GROUP-ID"):
            mv.set_state(State.PAUSED)

    def test_validation_rejects_duplicate_names(self, tmp_path):
        mv = self._build(tmp_path)
        for lang in ("en", "fr"):
            pad = mv.request_pad("audio_%u")
            pad.set_property("alternate-rendition", {
                "uri": f"{lang}/a.m3u8", "group_id": "aac", "name": "Same"})
        vpad = mv.request_pad("video_%u")
        vpad.set_property("variant", {"uri": "v0/v.m3u8", "bandwidth": 1,
                                      "audio": "aac"})
        import pytest
        from gst_plugins_rs_tpu.core.element import State
        with pytest.raises(ValueError, match="Duplicate NAME|duplicate NAME"):
            mv.set_state(State.PAUSED)

    def test_relative_uri_requires_directory(self, tmp_path, monkeypatch):
        # only errors when neither the master location nor the uri has a
        # directory component (imp.rs:547-558)
        monkeypatch.chdir(tmp_path)
        mv = fx.element_factory_make("hlsmultivariantsink")
        mv.set_property("multivariant-playlist-location", "multivariant.m3u8")
        pad = mv.request_pad("video_%u")
        import pytest
        with pytest.raises(ValueError, match="relative to the multivariant"):
            pad.set_property("variant", {"uri": "video.m3u8", "bandwidth": 1})


class TestHlsSink3EmbeddedTsMux:
    """Elementary-stream input mode: hlssink3 embeds mpegtsmux like the
    reference (hlssink3/imp.rs audio/video request pads)."""

    def test_es_input_muxes_and_segments(self, tmp_path):
        import numpy as np
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.mux import mpegts

        sink = fx.element_factory_make("hlssink3")
        sink.set_property("playlist-location", str(tmp_path / "video.m3u8"))
        sink.set_property("location", str(tmp_path / "segment%05d.ts"))
        sink.set_property("target-duration", 1)
        vsrc = fx.element_factory_make("appsrc")
        vsrc.set_property("caps", parse_caps("video/x-h264,stream-format=byte-stream"))
        asrc = fx.element_factory_make("appsrc")
        asrc.set_property("caps", parse_caps("audio/mpeg,mpegversion=4"))
        p = fx.Pipeline()
        for e in (vsrc, asrc, sink):
            p.add(e)
        vsrc.pad("src").link(sink.request_pad("video"))
        asrc.pad("src").link(sink.request_pad("audio"))
        vframes = [bytes([0, 0, 0, 1, 0x65, i]) * 40 for i in range(30)]
        for i, fr in enumerate(vframes):
            vsrc.push_buffer(fx.Buffer(np.frombuffer(fr, np.uint8),
                                       pts=i * 100_000_000))
        for i in range(15):
            asrc.push_buffer(fx.Buffer(np.frombuffer(bytes([0xFF, i]) * 100, np.uint8),
                                       pts=i * 200_000_000))
        vsrc.end_of_stream(); asrc.end_of_stream()
        p.play_until_eos()

        segs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ts"))
        assert len(segs) >= 2  # 3 s of content at 1 s target duration
        playlist = (tmp_path / "video.m3u8").read_text()
        assert playlist.count("#EXTINF:") == len(segs)
        assert playlist.rstrip().endswith("#EXT-X-ENDLIST")
        # every segment is whole TS packets starting with PAT/PMT
        all_es = b""
        for i, seg in enumerate(segs):
            data = (tmp_path / seg).read_bytes()
            assert len(data) % 188 == 0
            pkts = list(mpegts.iter_packets(data))
            assert pkts[0].pid == 0  # PAT leads each segment
            pids = {pk.pid for pk in pkts}
            assert 0x101 in pids and 0x102 in pids  # video + audio PIDs
            all_es += b"".join(pk.payload for pk in pkts
                               if pk.pid == 0x101 and pk.payload)
        # the video elementary stream survives mux + segmentation intact
        for fr in vframes:
            assert fr in all_es

    def test_single_pad_per_media(self, tmp_path):
        sink = fx.element_factory_make("hlssink3")
        sink.request_pad("video")
        import pytest
        with pytest.raises(ValueError, match="already requested"):
            sink.request_pad("video")


class TestHlsBaseSurface:
    """GstHlsBaseSink surface (reference hlssink3 other-types):
    EXT-X-PROGRAM-DATE-TIME and single-media-file byterange playout."""

    def test_program_date_time(self, tmp_path):
        os.chdir(tmp_path)
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=20 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! hlscmafsink name=sink target-duration=1 "
            "enable-program-date-time=true "
            f"playlist-location={tmp_path}/pdt.m3u8 "
            f"init-location={tmp_path}/i%05d.mp4 "
            f"location={tmp_path}/p%05d.m4s")
        p.play_until_eos()
        playlist = (tmp_path / "pdt.m3u8").read_text()
        pdts = [ln for ln in playlist.splitlines()
                if ln.startswith("#EXT-X-PROGRAM-DATE-TIME:")]
        assert len(pdts) == playlist.count("#EXTINF:")
        from datetime import datetime
        stamps = [datetime.fromisoformat(ln.split(":", 1)[1]) for ln in pdts]
        # pipeline-clock PDT: consecutive stamps differ by the 1 s segment
        d = (stamps[1] - stamps[0]).total_seconds()
        assert abs(d - 1.0) < 0.005

    def test_single_media_file_byteranges(self, tmp_path):
        os.chdir(tmp_path)
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=20 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! hlscmafsink name=sink target-duration=1 "
            f"single-media-file={tmp_path}/all.m4s "
            f"playlist-location={tmp_path}/smf.m3u8 "
            f"init-location={tmp_path}/si%05d.mp4 "
            f"location={tmp_path}/s%05d.m4s")
        p.play_until_eos()
        playlist = (tmp_path / "smf.m3u8").read_text()
        ranges = [ln for ln in playlist.splitlines()
                  if ln.startswith("#EXT-X-BYTERANGE:")]
        assert len(ranges) == playlist.count("#EXTINF:") == 2
        # the ranges tile the media file contiguously and each range
        # parses as a moof+mdat pair
        blob = (tmp_path / "all.m4s").read_bytes()
        init = next(tmp_path.glob("si*.mp4")).read_bytes()
        off = 0
        for ln in ranges:
            length, start = ln.split(":")[1].split("@")
            assert int(start) == off
            seg = blob[off:off + int(length)]
            assert reader.box_types(seg) == ["moof", "mdat"]
            off += int(length)
        assert off == len(blob)
        # no per-segment files were written
        assert not list(tmp_path.glob("s0*.m4s"))
