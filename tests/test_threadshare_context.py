"""Threadshare context + queue-level surface: shared TaskContext draining,
per-context source groups in Pipeline.run, queue levels/leaky, inter/proxy
channel accounting, ts-jitterbuffer stats, gopbuffer max-size-time.

Parity targets: generic/threadshare/src/queue/imp.rs (levels, leaky),
runtime/executor/scheduler.rs (same context => same thread),
generic/inter (channel limits)."""
import threading
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.element import State
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.core.taskcontext import TaskContext


def _buf(n=480, pts=None, dur=None):
    b = fx.Buffer(np.zeros(n, np.uint8))
    if pts is not None:
        b.pts = pts
    if dur is not None:
        b.duration = dur
    return b


class TestQueueLevels:
    def test_levels_track_buffers_bytes_time(self):
        q = fx.element_factory_make("queue")
        q.set_property("max-size-buffers", 0)
        q.set_property("max-size-bytes", 0)
        q.set_property("max-size-time", 0)
        # no pads linked: feed the internal deque directly via _enqueue
        q.on_ready_to_paused()
        # stall the worker by grabbing nothing — enqueue faster than the
        # unlinked srcpad push can drain is racy; use the accounting API
        q._stopping = True  # keep the worker from draining
        for i in range(3):
            q._enqueue("buffer", _buf(100, pts=i, dur=10_000_000))
        assert q.get_property("current-level-buffers") == 3
        assert q.get_property("current-level-bytes") == 300
        assert q.get_property("current-level-time") == 30_000_000
        q._stopping = False
        q.on_paused_to_ready()

    def test_leaky_upstream_drops_arriving(self):
        q = fx.element_factory_make("queue")
        q.set_property("max-size-buffers", 2)
        q.set_property("leaky", "upstream")
        q.on_ready_to_paused()
        q._stopping = True
        for i in range(5):
            q._enqueue("buffer", _buf(10, pts=i))
        assert q.get_property("current-level-buffers") == 2
        # oldest survive with leaky=upstream
        kept = [p.pts for k, p in q._items if k == "buffer"]
        assert kept == [0, 1]
        q._stopping = False
        q.on_paused_to_ready()

    def test_leaky_downstream_evicts_oldest(self):
        q = fx.element_factory_make("queue")
        q.set_property("max-size-buffers", 2)
        q.set_property("leaky", "downstream")
        q.on_ready_to_paused()
        q._stopping = True
        for i in range(5):
            q._enqueue("buffer", _buf(10, pts=i))
        kept = [p.pts for k, p in q._items if k == "buffer"]
        assert kept == [3, 4]
        q._stopping = False
        q.on_paused_to_ready()


class TestSharedContext:
    def test_two_ts_queues_share_one_context_thread(self):
        before = threading.active_count()
        p = fx.parse_launch(
            "audiotestsrc num-buffers=8 samplesperbuffer=256 "
            "! ts-queue context=shared-ctx ! appsink name=s1")
        p2 = fx.parse_launch(
            "audiotestsrc num-buffers=8 samplesperbuffer=256 "
            "! ts-queue context=shared-ctx ! appsink name=s2")
        p.set_state(State.PLAYING)
        p2.set_state(State.PLAYING)
        # both queues drain on ONE TaskContext thread
        assert TaskContext._registry["shared-ctx"].task_count == 2
        ctx_threads = [t for t in threading.enumerate()
                       if t.name == "gstpu-taskctx-shared-ctx"]
        assert len(ctx_threads) == 1
        p.run()
        p2.run()
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and (
                len(p.by_name("s1").samples) < 8
                or len(p2.by_name("s2").samples) < 8):
            time.sleep(0.01)
        assert len(p.by_name("s1").samples) == 8
        assert len(p2.by_name("s2").samples) == 8
        p.set_state(State.NULL)
        p2.set_state(State.NULL)
        assert "shared-ctx" not in TaskContext._registry
        del before

    def test_source_context_groups_run_parallel(self):
        # two sources in one pipeline on different contexts -> both drive
        src1 = fx.element_factory_make("ts-audiotestsrc")
        src1.set_property("num-buffers", 5)
        src1.set_property("samplesperbuffer", 128)
        src1.set_property("context", "grp-a")
        sink1 = fx.element_factory_make("appsink")
        src2 = fx.element_factory_make("ts-audiotestsrc")
        src2.set_property("num-buffers", 5)
        src2.set_property("samplesperbuffer", 128)
        src2.set_property("context", "grp-b")
        sink2 = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src1, sink1, src2, sink2)
        src1.link(sink1)
        src2.link(sink2)
        p.set_state(State.PLAYING)
        p.run()
        p.set_state(State.NULL)
        assert len(sink1.samples) == 5
        assert len(sink2.samples) == 5


class TestTsSourceProps:
    def test_ts_audiotestsrc_buffer_duration_and_mute(self):
        p = fx.parse_launch(
            "ts-audiotestsrc num-buffers=2 buffer-duration=20 mute=true "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! appsink name=sink")
        p.play_until_eos()
        samples = p.by_name("sink").samples
        assert len(samples) == 2
        data = np.asarray(samples[0].buffer.data)
        assert data.shape[0] == 960  # 20 ms @ 48 kHz
        assert not np.any(data)  # muted

    def test_ts_appsrc_do_timestamp(self):
        src = fx.element_factory_make("ts-appsrc")
        src.set_property("do-timestamp", True)
        src.set_property("caps", parse_caps("application/octet-stream"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        p.set_state(State.PLAYING)
        src.push_buffer(_buf(16))
        src.end_of_stream()
        p.run()
        p.set_state(State.NULL)
        assert sink.samples[0].buffer.pts is not None


class TestInterChannelAccounting:
    def test_intersrc_levels_and_drop_oldest(self):
        p1 = fx.parse_launch(
            "audiotestsrc num-buffers=6 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! intersink producer-name=lvl1")
        p1.play_until_eos()
        src = fx.element_factory_make("intersrc")
        src.set_property("producer-name", "lvl1")
        assert src.get_property("max-time") == 500_000_000
        from gst_plugins_rs_tpu.elements.generic.io import _channel

        ch = _channel("lvl1")
        assert ch.n_buffers == 6
        assert ch.level_time == 60_000_000  # 6 x 10 ms
        # a 30 ms cap drops oldest on the next push
        ch.max_time = 30_000_000
        ch.push("buffer", _buf(480, pts=99, dur=10_000_000))
        assert ch.level_time <= 40_000_000
        assert ch.dropped >= 1

    def test_ts_intersink_inter_context_alias(self):
        sink = fx.element_factory_make("ts-intersink")
        sink.set_property("inter-context", "chX")
        assert sink.get_property("producer-name") == "chX"
        src = fx.element_factory_make("ts-intersrc")
        src.set_property("inter-context", "chX")
        assert src.get_property("producer-name") == "chX"
        assert src.get_property("current-level-buffers") == 0

    def test_ts_proxysrc_levels(self):
        p1 = fx.parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! ts-proxysink proxy-context=plvl")
        p1.play_until_eos()
        src = fx.element_factory_make("ts-proxysrc")
        src.set_property("proxy-context", "plvl")
        assert src.get_property("current-level-buffers") == 3
        assert src.get_property("current-level-time") == 30_000_000


class TestJitterbufferSurface:
    def test_stats_and_do_lost_gap_event(self):
        import struct

        from gst_plugins_rs_tpu.core import Harness
        from gst_plugins_rs_tpu.core.events import EventType

        jb = fx.element_factory_make("ts-jitterbuffer")
        jb.set_property("latency", 0)  # forward immediately
        jb.set_property("do-lost", True)
        h = Harness(jb)
        h.set_src_caps(parse_caps("application/x-rtp"))

        def rtp(seq):
            return struct.pack("!BBHII", 0x80, 96, seq, seq * 960, 0xABCD)

        h.push(fx.Buffer(np.frombuffer(rtp(0), np.uint8), pts=0))
        # skip seq 1: with latency 0 the gap is declared lost immediately
        h.push(fx.Buffer(np.frombuffer(rtp(2), np.uint8), pts=20_000_000))
        stats = jb.get_property("stats")
        assert stats["num-lost"] == 1
        assert stats["num-pushed"] == 2
        gaps = [e for e in h.events if e.type == EventType.GAP]
        assert gaps, "do-lost must emit a GAP event"

    def test_misorder_resync(self):
        import struct

        from gst_plugins_rs_tpu.core import Harness

        jb = fx.element_factory_make("ts-jitterbuffer")
        jb.set_property("latency", 0)
        jb.set_property("max-misorder-time", 100)  # ms
        h = Harness(jb)
        h.set_src_caps(parse_caps("application/x-rtp"))

        def rtp(seq):
            return struct.pack("!BBHII", 0x80, 96, seq, seq * 960, 0xABCD)

        h.push(fx.Buffer(np.frombuffer(rtp(1000), np.uint8), pts=10_000_000_000))
        # ancient backward packet (>100 ms older) forces a resync, after
        # which forwarding continues from the new position
        h.push(fx.Buffer(np.frombuffer(rtp(10), np.uint8), pts=0))
        h.push(fx.Buffer(np.frombuffer(rtp(11), np.uint8), pts=20_000_000))
        assert len(h.pull_all()) == 3


class TestGopBufferCap:
    def test_max_size_time_drops_oldest_gops(self):
        from gst_plugins_rs_tpu.core import BufferFlags, Harness

        el = fx.element_factory_make("gopbuffer")
        el.set_property("minimum-duration", 10_000_000_000)  # hold everything
        el.set_property("max-size-time", 2_000_000_000)
        h = Harness(el)
        h.set_src_caps(parse_caps("video/x-raw"))
        for g in range(5):  # five 1 s GOPs: key + delta
            key = fx.Buffer(np.zeros(8, np.uint8), pts=g * 1_000_000_000,
                            duration=500_000_000)
            h.push(key)
            delta = fx.Buffer(np.zeros(8, np.uint8),
                              pts=g * 1_000_000_000 + 500_000_000,
                              duration=500_000_000)
            delta.set_flag(BufferFlags.DELTA_UNIT)
            h.push(delta)
        # stored span is capped near 2 s: old closed GOPs were dropped
        assert len(el._gops) + 1 <= 3


class TestUdpSenderAddressMeta:
    def test_ts_udpsrc_attaches_net_address_meta(self):
        import socket

        from gst_plugins_rs_tpu.elements.net.udp import NetAddressMeta

        src = fx.element_factory_make("ts-udpsrc")
        src.set_property("address", "127.0.0.1")
        src.set_property("port", 0)
        src.set_property("num-buffers", 1)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        p.set_state(State.PLAYING)
        port = src._sock.getsockname()[1]
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(b"hello", ("127.0.0.1", port))
        p.run()
        p.set_state(State.NULL)
        tx.close()
        metas = list(sink.samples[0].buffer.iter_meta(NetAddressMeta))
        assert metas and metas[0].host == "127.0.0.1"
