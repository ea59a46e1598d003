"""Tests for the misc inventory batch: textahead, streamgrouper,
s302mparse, ac4parse, uriplaylistbin, viuersink, ts-proxy bridge."""
import struct

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


class TestTextAhead:
    def test_lookahead_default(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        el = fx.element_factory_make("textahead")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, el, sink):
            p.add(e)
        src.link(el); el.link(sink)
        for i, t in enumerate(["one", "two", "three"]):
            src.push_buffer(fx.Buffer(t, pts=i * 10**9))
        src.end_of_stream()
        p.play_until_eos()
        texts = [str(s.buffer.data) for s in sink.samples]
        assert texts == ["one\ntwo", "two\nthree", "three"]
        # pts follows the *current* text, not the lookahead
        assert [s.buffer.pts for s in sink.samples] == [0, 10**9, 2 * 10**9]

    def test_attributes_and_previous(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        el = fx.element_factory_make("textahead")
        el.set_property("n-ahead", 0)
        el.set_property("n-previous", 1)
        el.set_property("current-attributes", 'foreground="yellow"')
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, el, sink):
            p.add(e)
        src.link(el); el.link(sink)
        for t in ("a", "b"):
            src.push_buffer(fx.Buffer(t, pts=0))
        src.end_of_stream()
        p.play_until_eos()
        texts = [str(s.buffer.data) for s in sink.samples]
        assert texts[0] == '<span foreground="yellow">a</span>'
        assert texts[1] == 'a\n<span foreground="yellow">b</span>'


class TestStreamGrouper:
    def test_shared_group_id(self):
        g = fx.element_factory_make("streamgrouper")
        seen = []

        sinks = []
        for i in range(2):
            pad = g.request_sink_pad()
            out = g.pad(f"src_{i}")
            peer = fx.core.element.Pad(
                f"probe{i}", fx.core.element.PadDirection.SINK, None
            )
            peer.chain_function = lambda p, b: fx.FlowReturn.OK
            peer.event_function = lambda p, ev: (seen.append(ev), True)[1]
            out.link(peer)
            sinks.append(pad)
        for i, pad in enumerate(sinks):
            pad.send_event(fx.Event.new_stream_start(f"stream-{i}"))
        starts = [e for e in seen if e.type == fx.EventType.STREAM_START]
        assert len(starts) == 2
        gids = {e.fields["group_id"] for e in starts}
        assert len(gids) == 1  # both streams share the group id
        assert {e.fields["stream_id"] for e in starts} == {"stream-0", "stream-1"}


class TestAudioParsers:
    def test_s302m_header(self):
        # AES3 header: 6 channels (code 2), 20-bit (code 1)
        header = struct.pack(">HH", 240, (2 << 14) | (1 << 4))
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("audio/x-smpte-302m"))
        parse = fx.element_factory_make("s302mparse")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, parse, sink):
            p.add(e)
        src.link(parse); parse.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(header + b"\x00" * 240, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        s = sink.caps.structure(0)
        assert s["channels"] == 6 and s["depth"] == 20 and s["rate"] == 48000
        assert len(sink.samples) == 1

    def test_ac4_framing(self):
        def frame(payload, crc=False):
            sync = b"\xac\x41" if crc else b"\xac\x40"
            return sync + struct.pack(">H", len(payload)) + payload + (b"\x00\x00" if crc else b"")

        stream = b"junk" + frame(b"A" * 10) + frame(b"B" * 5, crc=True)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("audio/x-ac4"))
        parse = fx.element_factory_make("ac4parse")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, parse, sink):
            p.add(e)
        src.link(parse); parse.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(stream, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data).tobytes() for s in sink.samples]
        assert frames == [frame(b"A" * 10), frame(b"B" * 5, crc=True)]
        assert sink.caps.structure(0)["framed"] is True


class TestUriPlaylist:
    def test_sequential_and_iterations(self, tmp_path):
        f1, f2 = tmp_path / "a.bin", tmp_path / "b.bin"
        f1.write_bytes(b"AAAA")
        f2.write_bytes(b"BB")
        p = fx.parse_launch(
            f"uriplaylistbin uris=file://{f1},file://{f2} iterations=2 ! appsink name=sink"
        )
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in p.by_name("sink").samples)
        assert data == b"AAAABB" * 2
        msgs = [m for m in p.bus.messages()
                if m.structure and m.structure.name == "uri-playlist-item-started"]
        assert len(msgs) == 4
        assert msgs[0].structure["index"] == 0 and msgs[1].structure["index"] == 1


class TestViuer:
    def test_renders_ansi(self):
        p = fx.parse_launch(
            "videotestsrc pattern=red num-buffers=1 "
            "! video/x-raw,format=RGB,width=64,height=32,framerate=30/1 "
            "! viuersink name=sink width=16"
        )
        p.play_until_eos()
        render = p.by_name("sink").last_render
        assert "\x1b[38;2;255;0;0m" in render
        assert render.count("▀") == 16 * (16 * 32 // 64 // 2 * 2 // 2)


class TestProxy:
    def test_bridge(self):
        send = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=3 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! ts-proxysink proxy-context=ctx1"
        )
        send.play_until_eos()
        recv = fx.parse_launch("ts-proxysrc proxy-context=ctx1 ! appsink name=sink")
        recv.play_until_eos()
        out = recv.by_name("sink").concat_audio()
        assert out.shape == (1440, 1)
        assert recv.by_name("sink").caps.structure(0)["rate"] == 48000
