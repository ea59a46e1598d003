"""Seeking subsystem: SEEK events (flushing-seek protocol),
SEEKING/POSITION/DURATION queries, sample-exact source repositioning,
queue flush semantics, byte-domain filesrc seeks."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.element import State
from gst_plugins_rs_tpu.core.events import Event, EventType, Query


class TestQueries:
    def test_duration_and_position(self):
        p = fx.parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=4800 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! appsink name=sink")
        p.set_state(State.PLAYING)
        p.run(max_iterations=3)
        assert p.query_duration() == 10 * 100_000_000  # 10 x 100ms
        assert p.query_position() == 3 * 100_000_000
        p.set_state(State.NULL)

    def test_seeking_query(self):
        src = fx.element_factory_make("audiotestsrc")
        q = Query.new_seeking()
        src._src_query(src.srcpad, q)
        assert q.result["seekable"] is True
        live = fx.element_factory_make("audiotestsrc")
        live.set_property("is-live", True)
        q = Query.new_seeking()
        live._src_query(live.srcpad, q)
        assert q.result["seekable"] is False


class TestSeek:
    def test_sample_exact_reposition(self):
        # reference contract: a seek to T produces the same samples a
        # fresh stream starting at T would
        def collect(seek_to=None, n=4):
            p = fx.parse_launch(
                "audiotestsrc wave=sine num-buffers=200 samplesperbuffer=480 "
                "! audio/x-raw,format=F32,rate=48000,channels=1 "
                "! appsink name=sink")
            p.set_state(State.PLAYING)
            if seek_to is not None:
                p.run(max_iterations=5)  # play a bit first
                p.by_name("sink").samples.clear()
                assert p.seek(seek_to)
            p.run(max_iterations=n)
            out = np.concatenate(
                [np.asarray(s.buffer.data) for s in p.by_name("sink").samples])
            pts0 = p.by_name("sink").samples[0].buffer.pts
            p.set_state(State.NULL)
            return out, pts0

        seeked, pts = collect(seek_to=1_000_000_000)
        assert pts == 1_000_000_000  # pts restart at the seek target
        # synth from offset 48000 directly
        p2 = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=200 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! appsink name=sink")
        p2.set_state(State.PLAYING)
        p2.seek(1_000_000_000)
        p2.run(max_iterations=4)
        ref = np.concatenate(
            [np.asarray(s.buffer.data) for s in p2.by_name("sink").samples])
        p2.set_state(State.NULL)
        np.testing.assert_array_equal(seeked, ref)

    def test_flush_events_travel_downstream(self):
        src = fx.element_factory_make("audiotestsrc")
        src.set_property("num-buffers", 100)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        p.set_state(State.PLAYING)
        p.run(max_iterations=2)
        events = []
        orig = sink.sinkpad.event_function

        def spy(pad, ev):
            events.append(ev.type)
            return orig(pad, ev)

        sink.sinkpad.event_function = spy
        assert p.seek(500_000_000)
        assert events[:3] == [EventType.FLUSH_START, EventType.FLUSH_STOP,
                              EventType.SEGMENT]
        p.set_state(State.NULL)

    def test_seek_before_playing_prerolls_at_target(self):
        p = fx.parse_launch(
            "videotestsrc num-buffers=5 "
            "! video/x-raw,format=RGB,width=8,height=8,framerate=10/1 "
            "! appsink name=sink")
        p.set_state(State.PLAYING)
        p.seek(300_000_000)  # 3 frames in
        p.run()
        pts = [s.buffer.pts for s in p.by_name("sink").samples]
        assert pts[0] == 300_000_000
        p.set_state(State.NULL)

    def test_queue_drops_content_on_flush(self):
        q = fx.element_factory_make("queue")
        q.on_ready_to_paused()
        q._stopping = True  # hold the worker
        q._enqueue("buffer", fx.Buffer(np.zeros(8, np.uint8), pts=0))
        q._enqueue("buffer", fx.Buffer(np.zeros(8, np.uint8), pts=1))
        assert q.get_property("current-level-buffers") == 2
        q._event(q.sinkpad, Event(EventType.FLUSH_START))
        assert q.get_property("current-level-buffers") == 0
        q._stopping = False
        q.on_paused_to_ready()

    def test_filesrc_byte_seek(self, tmp_path):
        f = tmp_path / "data.bin"
        f.write_bytes(bytes(range(200)))
        src = fx.element_factory_make("rsfilesrc")
        src.set_property("location", str(f))
        src.set_property("blocksize", 50)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        p.set_state(State.PLAYING)
        assert src.send_event(Event.new_seek(100, fmt="bytes", flush=False))
        p.run()
        data = b"".join(np.asarray(s.buffer.data, np.uint8).tobytes()
                        for s in sink.samples)
        assert data == bytes(range(100, 200))
        p.set_state(State.NULL)


def test_filesrc_byte_seek_with_stop(tmp_path):
    """rsfilesrc honors byte seeks with stop positions and reports the
    file size on duration queries."""
    path = tmp_path / "blob.bin"
    payload = bytes(range(256)) * 40  # 10240 bytes
    path.write_bytes(payload)
    p = fx.parse_launch(
        f"rsfilesrc name=src location={path} blocksize=1000 ! appsink name=sink")
    src = p.by_name("src")
    from gst_plugins_rs_tpu.core.events import Event

    assert src.handle_seek(Event.new_seek(2_000, 7_000, fmt="bytes"))
    p.play_until_eos()
    data = b"".join(np.asarray(s.buffer.data).tobytes()
                    for s in p.by_name("sink").samples)
    assert data == payload[2_000:7_000]
    assert src.duration_ns() == len(payload)
    assert p.by_name("sink").samples[0].buffer.offset == 2_000


class TestSeekFormatCheck:
    """ADVICE r3 (medium): gst_base_src rejects seeks whose format the
    source cannot serve — a Pipeline.seek() time broadcast must not turn
    into a byte offset on rsfilesrc (and vice versa)."""

    def test_byte_source_rejects_time_seek(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(bytes(range(256)) * 4)
        src = fx.element_factory_make("rsfilesrc")
        src.set_property("location", str(p))
        src.set_state(State.PAUSED)
        assert not src.send_event(Event.new_seek(500_000_000, fmt="time"))
        assert src.send_event(Event.new_seek(100, fmt="bytes", flush=False))
        src.set_state(State.NULL)

    def test_time_source_rejects_bytes_seek(self):
        src = fx.element_factory_make("audiotestsrc")
        assert not src.handle_seek(Event.new_seek(4096, fmt="bytes"))
        assert src.handle_seek(Event.new_seek(250_000_000, fmt="time"))

    def test_segment_carries_format(self, tmp_path):
        p = tmp_path / "g.bin"
        p.write_bytes(bytes(1000))
        src = fx.element_factory_make("rsfilesrc")
        src.set_property("location", str(p))
        assert src.segment.format == "bytes"
        src.set_state(State.PAUSED)
        src.handle_seek(Event.new_seek(10, fmt="bytes", flush=False))
        assert src.segment.format == "bytes"
        src.set_state(State.NULL)
        tsrc = fx.element_factory_make("audiotestsrc")
        assert tsrc.segment.format == "time"
