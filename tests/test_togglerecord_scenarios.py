"""togglerecord scenario matrix, mirrored 1:1 from the reference's
`/root/reference/utils/togglerecord/tests/tests.rs` (2 260 lines, 26
tests): threaded senders per stream (the secondary streams genuinely BLOCK
in chain until the main stream's record decision reaches their position),
open/close cycles, PTS shifts, gaps, delta-frame close deferral, non-live
blocking inputs, live-output offsets, and the EOS ordering matrix.

Timeline-mechanism adaptation (documented divergence): the reference keeps
input PTS untouched and collapses recorded spans into contiguous running
time via the OUTPUT SEGMENT; this element re-timestamps the output PTS
onto the recording timeline and forwards the segment unchanged.  The
observable running time is identical, so the reference's running-time
expectations are asserted against our output PTS (and the reference's
"input pts" expectations against our captured input positions).
"""
import queue
import threading
import time

import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    BufferFlags,
    Caps,
    Event,
    EventType,
    Pad,
    PadDirection,
    SECOND,
    Segment,
    State,
    TestClock,
    element_factory_make,
)

MS = SECOND // 1000
FRAME = 20 * MS
RECV_TIMEOUT = 10.0
MAIN_BYTES = 320 * 240 * 4
SEC_SAMPLES = 16  # 20 ms at 800 Hz

BUFFERS = "buffers"
BUFFERS_DELTA = "buffers-delta"
GAPS = "gaps"
EOS = "eos"
TERMINATE = "terminate"


def make_togglerecord(**props):
    tr = element_factory_make("togglerecord")
    for k, v in props.items():
        tr.set_property(k, v)
    tr.set_state(State.PLAYING)
    return tr


class Sender(threading.Thread):
    """The reference's sender thread: pushes batches on ITS OWN thread so
    blocking chains (secondary waiting on main, non-live waiting on
    record=true) behave like the real streaming threads."""

    def __init__(self, tr, main, offset=0, live=True):
        super().__init__(daemon=True)
        self.main = main
        self.offset = offset
        self.live = live
        if main:
            self.sinkpad = tr.pad("sink")
            srcpad = tr.pad("src")
        else:
            self.sinkpad = tr.request_sink_pad()
            srcpad = tr.pad("src_" + self.sinkpad.name.split("_")[1])
        feeder = Pad("feeder", PadDirection.SRC)

        def latency_query(pad, q):
            from gst_plugins_rs_tpu.core.events import QueryType

            if q.type == QueryType.LATENCY:
                q.result.update(live=live, min_latency=0, max_latency=None)
                return True
            return False

        feeder.query_function = latency_query
        feeder.link(self.sinkpad)
        self.feeder = feeder

        self.output = queue.Queue()  # ("buffer", pts, dur) | ("gap", ...) | ("event", type)
        cap = Pad("cap", PadDirection.SINK)

        def on_buf(pad, b):
            from gst_plugins_rs_tpu.core import FlowReturn

            self.output.put(("buffer", b.pts, b.duration))
            return FlowReturn.OK

        def on_event(pad, e):
            if e.type == EventType.GAP:
                self.output.put(("gap", e.get("pts"), e.get("duration")))
            else:
                self.output.put(("event", e.type))
            return True

        cap.chain_function = on_buf
        cap.event_function = on_event
        srcpad.link(cap)

        self.inbox = queue.Queue()
        self.done = queue.Queue()
        self.batches_sent = 0
        self.dones_consumed = 0
        self._i = 0
        self._first = True
        self.start()

    def run(self):
        while True:
            item = self.inbox.get()
            kind, n = item
            if self._first:
                self.feeder.push_event(Event.new_stream_start("test"))
                caps = (Caps.builder("video/x-raw", format="ARGB", width=320,
                                     height=240)
                        if self.main else
                        Caps.builder("audio/x-raw", format="U8", rate=800,
                                     channels=1, layout="interleaved"))
                self.feeder.push_event(Event.new_caps(caps))
                self.feeder.push_event(Event.new_segment(Segment()))
                self._first = False
            if kind == EOS:
                self.feeder.push_event(Event.new_eos())
                self.done.put(())
                return
            if kind == TERMINATE:
                self.done.put(())
                return
            for _ in range(n):
                pts = self.offset + self._i * FRAME
                if kind == GAPS:
                    self.feeder.push_event(Event.new_gap(pts, FRAME))
                else:
                    data = (np.zeros(MAIN_BYTES, np.uint8) if self.main
                            else np.zeros((SEC_SAMPLES, 1), np.uint8))
                    flags = (BufferFlags.DELTA_UNIT if kind == BUFFERS_DELTA
                             else BufferFlags.NONE)
                    buf = Buffer(data, pts=pts, duration=FRAME, flags=flags)
                    if self.main:
                        buf.dts = pts
                    self.feeder.push(buf)
                self._i += 1
            self.done.put(())

    # -- driving -----------------------------------------------------------
    def send(self, kind, n=0):
        self.batches_sent += 1
        self.inbox.put((kind, n))

    def wait_done(self, timeout=RECV_TIMEOUT):
        try:
            self.done.get(timeout=timeout)
            self.dones_consumed += 1
        except queue.Empty:
            raise AssertionError("sender batch did not complete (blocked?)")

    def wait_all(self, timeout=RECV_TIMEOUT):
        """Consume dones until every batch sent so far has completed (the
        reference lets dones accumulate and only syncs at milestones)."""
        while self.dones_consumed < self.batches_sent:
            self.wait_done(timeout)

    def expect_blocked(self, timeout=0.05):
        try:
            self.done.get(timeout=timeout)
            raise AssertionError("sender was expected to block")
        except queue.Empty:
            pass

    def recv_buffers(self, wait_buffers=0, timeout=RECV_TIMEOUT):
        """(list of (pts, duration) for buffers AND gaps, saw_eos)."""
        res, saw_eos = [], False
        while True:
            try:
                item = self.output.get(timeout=timeout if wait_buffers or
                                       not res else 0.2)
            except queue.Empty:
                return res, saw_eos
            if item[0] in ("buffer", "gap"):
                res.append((item[1], item[2]))
                if wait_buffers and len(res) == wait_buffers:
                    return res, saw_eos
            elif item[0] == "event" and item[1] == EventType.EOS:
                return res, True


def assert_timeline(buffers, n, rt0=0, dur=FRAME):
    assert len(buffers) == n, (len(buffers), n)
    for i, (pts, duration) in enumerate(buffers):
        assert pts == rt0 + i * dur, (i, pts, rt0 + i * dur)
        assert duration == dur


# ---------------------------------------------------------------------------


def test_create():
    assert element_factory_make("togglerecord") is not None


def test_create_pads():
    tr = element_factory_make("togglerecord")
    sinkpad = tr.request_sink_pad()
    assert sinkpad.name == "sink_0"
    assert tr.pad("src_0") is not None


def _one_stream_open(**props):
    tr = make_togglerecord(**props)
    s = Sender(tr, True, live=not props)
    tr.set_property("record", True)
    s.send(BUFFERS, 10)
    s.wait_done()
    s.send(EOS)
    s.wait_done()
    bufs, _ = s.recv_buffers(10)
    assert_timeline(bufs, 10)


def test_one_stream_open():
    _one_stream_open()


def test_one_stream_open_nonlivein_nonliveout():
    _one_stream_open(**{"is-live": False})


def test_one_stream_open_nonlivein_liveout():
    _one_stream_open(**{"is-live": True})


def test_one_stream_gaps_open():
    tr = make_togglerecord()
    s = Sender(tr, True)
    tr.set_property("record", True)
    s.send(BUFFERS, 5)
    s.send(GAPS, 5)
    s.wait_done(); s.wait_done()
    s.send(EOS); s.wait_done()
    bufs, _ = s.recv_buffers(10)
    assert_timeline(bufs, 10)  # gaps ride the same timeline


def test_one_stream_close_open():
    tr = make_togglerecord()
    s = Sender(tr, True)
    s.send(BUFFERS, 10)
    s.wait_done()
    tr.set_property("record", True)
    s.send(BUFFERS, 10)
    s.wait_done()
    s.send(EOS); s.wait_done()
    bufs, _ = s.recv_buffers(10)
    # input pts (10+i)*20ms collapse onto a contiguous recording timeline
    assert_timeline(bufs, 10)


def test_one_stream_open_close():
    tr = make_togglerecord()
    s = Sender(tr, True)
    tr.set_property("record", True)
    s.send(BUFFERS, 10)
    s.wait_done()
    tr.set_property("record", False)
    s.send(BUFFERS, 10)
    s.wait_done()
    s.send(EOS); s.wait_done()
    bufs, _ = s.recv_buffers(10)
    assert_timeline(bufs, 10)


def test_one_stream_open_close_open():
    tr = make_togglerecord()
    s = Sender(tr, True)
    tr.set_property("record", True)
    s.send(BUFFERS, 10); s.wait_done()
    tr.set_property("record", False)
    s.send(BUFFERS, 10); s.wait_done()
    tr.set_property("record", True)
    s.send(BUFFERS, 10); s.wait_done()
    s.send(EOS); s.wait_done()
    bufs, _ = s.recv_buffers(20)
    # both recorded spans collapse into ONE contiguous 20-buffer timeline
    assert_timeline(bufs, 20)


# -- two-stream scenarios ----------------------------------------------------


def _two_streams(offset_main=0, offset_sec=0, **props):
    tr = make_togglerecord(**props)
    live = "is-live" not in props
    s1 = Sender(tr, True, offset=offset_main, live=live)
    s2 = Sender(tr, False, offset=offset_sec, live=live)
    return tr, s1, s2


def test_two_stream_open():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    s1.send(EOS); s1.wait_done()
    s2.send(EOS)
    s2.wait_done(); s2.wait_done()
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    # the 11th secondary buffer (past the main EOS position) is dropped
    bufs2, _ = s2.recv_buffers(10)
    assert_timeline(bufs2, 10)


def test_two_stream_open_shift():
    tr, s1, s2 = _two_streams(offset_sec=5 * MS)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    s1.send(EOS); s1.wait_done()
    s2.send(EOS)
    s2.wait_done(); s2.wait_done()
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    # secondary runs 5 ms late: its 10th buffer is clipped to the main
    # span's end, the 11th dropped
    bufs2, _ = s2.recv_buffers(10)
    assert len(bufs2) == 10
    for i, (pts, dur) in enumerate(bufs2):
        assert pts == 5 * MS + i * FRAME
        assert dur == (15 * MS if i == 9 else FRAME)


def test_two_stream_open_shift_main():
    tr, s1, s2 = _two_streams(offset_main=5 * MS)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 12)
    s1.wait_done()
    s1.send(EOS); s1.wait_done()
    s2.send(EOS)
    s2.wait_done(); s2.wait_done()
    # main pts 5ms+i*20 collapse to the recording timeline
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    # secondary: first buffer clipped at the recording start (15 ms left),
    # 11th clipped at the end (5 ms), 12th dropped
    bufs2, _ = s2.recv_buffers(11)
    assert len(bufs2) == 11
    for i, (pts, dur) in enumerate(bufs2):
        if i == 0:
            assert (pts, dur) == (0, 15 * MS)
        elif i == 10:
            assert (pts, dur) == (i * FRAME - 5 * MS, 5 * MS)
        else:
            assert (pts, dur) == (i * FRAME - 5 * MS, FRAME)


def test_two_stream_open_close():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done()
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    bufs2, _ = s2.recv_buffers(10)
    assert_timeline(bufs2, 10)


def test_two_stream_close_open():
    tr, s1, s2 = _two_streams()
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done()
    # recorded span = second half; timelines collapse to zero
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    bufs2, _ = s2.recv_buffers(10)
    assert_timeline(bufs2, 10)


def test_two_stream_close_open_nonlivein_nonliveout():
    tr, s1, s2 = _two_streams(**{"is-live": False})
    s1.send(BUFFERS, 10)
    s1.expect_blocked()  # non-live input BLOCKS while not recording
    s2.send(BUFFERS, 11)
    s2.expect_blocked()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s1.wait_done()
    s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done()
    # nothing was dropped: all 20 buffers flow with their original pts
    bufs1, _ = s1.recv_buffers(20)
    assert_timeline(bufs1, 20)
    bufs2, _ = s2.recv_buffers(20)
    assert_timeline(bufs2, 20)


def test_two_stream_close_open_nonlivein_liveout():
    # reference marks this racy/#[ignore]d upstream; deterministic here
    tc = TestClock()
    tr = element_factory_make("togglerecord")
    tr.set_property("is-live", True)
    tr.clock = tc
    tr.set_state(State.PLAYING)
    s1 = Sender(tr, True, live=False)
    s2 = Sender(tr, False, live=False)
    s1.send(BUFFERS, 10)
    s1.expect_blocked()
    s2.send(BUFFERS, 11)
    s2.expect_blocked()
    block_time = 42 * MS
    tc.advance(block_time)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s1.wait_done()
    s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done()
    # live output: the blocked wall time shifts the output timeline
    bufs1, _ = s1.recv_buffers(20)
    assert_timeline(bufs1, 20, rt0=block_time)
    bufs2, _ = s2.recv_buffers(20)
    assert_timeline(bufs2, 20, rt0=block_time)


def test_two_stream_open_close_open():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done()
    s2.send(BUFFERS, 1)  # blocks until main advances; must NOT be dropped
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s1.wait_done()
    s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done(); s2.wait_done()
    bufs1, _ = s1.recv_buffers(20)
    assert_timeline(bufs1, 20)
    bufs2, _ = s2.recv_buffers(20)
    assert_timeline(bufs2, 20)


def test_two_stream_open_close_open_nonlivein_nonliveout():
    tr, s1, s2 = _two_streams(**{"is-live": False})
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s1.wait_all(); s2.wait_all()
    s2.send(BUFFERS, 1)
    s2.expect_blocked()  # ahead of the main position
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)  # blocks per-buffer while stopped (non-live)
    s2.send(BUFFERS, 9)
    s2.send(BUFFERS, 10)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s1.wait_all(); s2.wait_all()
    s1.send(EOS); s2.send(EOS)
    s1.wait_all(); s2.wait_all()
    # non-live inputs never drop: all buffers flow with their original pts
    bufs1, _ = s1.recv_buffers(30)
    assert_timeline(bufs1, 30)
    bufs2, _ = s2.recv_buffers(30)
    assert_timeline(bufs2, 30)


def test_two_stream_open_close_open_nonlivein_liveout():
    tc = TestClock()
    tr = element_factory_make("togglerecord")
    tr.set_property("is-live", True)
    tr.clock = tc
    tr.set_state(State.PLAYING)
    s1 = Sender(tr, True, live=False)
    s2 = Sender(tr, False, live=False)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s1.wait_all(); s2.wait_all()
    s2.send(BUFFERS, 1)
    s2.expect_blocked()  # ahead of the main position
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)  # blocks per-buffer while stopped (non-live)
    s2.send(BUFFERS, 10)
    # wait until the main sender is genuinely inside the stopped block
    # before advancing the clock (the blocked span is measured on it)
    t0 = time.time()
    while tr._time_start_block is None:
        assert time.time() - t0 < 5, "main sender never blocked"
        time.sleep(0.005)
    block_time = 42 * MS
    tc.advance(block_time)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s1.wait_all()
    # the secondary's final buffer overshoots the main position and only
    # resolves once the main stream EOSes (the reference's ordering)
    s1.send(EOS); s1.wait_all()
    s2.wait_all()
    s2.send(EOS); s2.wait_all()
    # live output: buffers released after the block carry the blocked
    # wall time as an offset; the pre-block span is untouched.  The
    # secondary's last buffer crosses the final stop and is dropped
    # (reference: in_gap + after_gap - 1).
    bufs1, _ = s1.recv_buffers(30)
    assert_timeline(bufs1[:10], 10)
    assert_timeline(bufs1[10:], 20, rt0=block_time + 10 * FRAME)
    bufs2, _ = s2.recv_buffers(30)
    assert_timeline(bufs2[:11], 11)
    assert_timeline(bufs2[11:], 19, rt0=block_time + 11 * FRAME)


def test_two_stream_open_close_open_gaps():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 3)
    s1.send(GAPS, 3)
    s1.send(BUFFERS, 4)
    s2.send(BUFFERS, 11)
    s1.wait_done(); s1.wait_done(); s1.wait_done()
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)
    s2.wait_done()
    s2.send(GAPS, 4)
    s2.send(BUFFERS, 5)
    s1.wait_done()
    s2.wait_done(); s2.wait_done()
    s2.send(GAPS, 1)  # blocks; must not be dropped
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s1.wait_done()
    s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done(); s2.wait_done()
    bufs1, _ = s1.recv_buffers(20)
    assert_timeline(bufs1, 20)
    bufs2, _ = s2.recv_buffers(20)
    assert_timeline(bufs2, 20)


def test_two_stream_close_open_close_delta():
    tr, s1, s2 = _two_streams()
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s1.wait_done()
    # starting on a delta frame defers the start to the next keyframe
    tr.set_property("record", True)
    s1.send(BUFFERS_DELTA, 1)
    s1.send(BUFFERS, 9)
    s2.wait_done()
    s2.send(BUFFERS, 9)
    s1.wait_done(); s1.wait_done()
    s2.wait_done()
    s2.send(BUFFERS, 1)  # blocks; still recording, must not be dropped
    # stopping on a delta frame defers the stop to the next keyframe
    tr.set_property("record", False)
    s1.send(BUFFERS_DELTA, 1)
    s1.send(BUFFERS, 9)
    s2.send(BUFFERS, 10)
    s1.wait_done(); s1.wait_done()
    s2.wait_done()
    s1.send(EOS); s2.send(EOS)
    s1.wait_done(); s2.wait_done(); s2.wait_done()
    # recorded span: input pts (11..20)*20ms -> collapsed to 0..
    # (10 buffers: 9 keyframes after the dropped delta + the deferred-stop
    # delta frame recorded before the closing keyframe)
    bufs1, _ = s1.recv_buffers(10)
    assert_timeline(bufs1, 10)
    bufs2, _ = s2.recv_buffers(10)
    assert_timeline(bufs2, 10)


def test_three_stream_open_close_open():
    tr = make_togglerecord()
    s1 = Sender(tr, True)
    s2 = Sender(tr, False)
    s3 = Sender(tr, False)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 11)
    s3.send(BUFFERS, 11)
    s1.wait_done()
    tr.set_property("record", False)
    s1.send(BUFFERS, 10)
    s2.wait_done(); s3.wait_done()
    s2.send(BUFFERS, 9)
    s3.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done(); s3.wait_done()
    s2.send(BUFFERS, 1)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 10)
    s3.send(BUFFERS, 5)
    s1.wait_done()
    s2.wait_done()
    s3.wait_done()
    s3.send(BUFFERS, 5)
    s3.wait_done()
    s1.send(EOS); s2.send(EOS); s3.send(EOS)
    s1.wait_done(); s2.wait_done(); s3.wait_done()
    for s in (s1, s2, s3):
        bufs, _ = s.recv_buffers(20)
        assert_timeline(bufs, 20)


def test_two_stream_main_eos():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done()
    s1.send(EOS); s1.wait_done()
    # main EOS'd ahead of the secondary: still recording
    assert tr.get_property("recording")
    s2.send(BUFFERS, 2)
    s2.wait_done()
    s2.send(TERMINATE); s2.wait_done()
    assert not tr.get_property("recording")
    bufs1, saw_eos = s1.recv_buffers()
    assert_timeline(bufs1, 10)
    assert saw_eos
    # the secondary's 11th position crosses the final stop: dropped + EOS
    bufs2, saw_eos = s2.recv_buffers()
    assert_timeline(bufs2, 10)
    assert saw_eos


def test_two_stream_secondary_eos_first():
    tr, s1, s2 = _two_streams()
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done()
    s2.send(EOS); s2.wait_done()
    assert tr.get_property("recording")
    s1.send(EOS); s1.wait_done()
    assert not tr.get_property("recording")
    bufs1, saw_eos = s1.recv_buffers()
    assert_timeline(bufs1, 10)
    assert saw_eos
    bufs2, saw_eos = s2.recv_buffers()
    assert_timeline(bufs2, 9)
    assert saw_eos


def test_three_stream_main_eos():
    tr = make_togglerecord()
    s1 = Sender(tr, True)
    s2 = Sender(tr, False)
    s3 = Sender(tr, False)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 9)
    s3.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done(); s3.wait_done()
    s1.send(EOS); s1.wait_done()
    assert tr.get_property("recording")
    s2.send(BUFFERS, 2); s2.wait_done()
    s2.send(TERMINATE); s2.wait_done()
    assert tr.get_property("recording")  # third stream not EOS yet
    s3.send(BUFFERS, 2); s3.wait_done()
    s3.send(TERMINATE); s3.wait_done()
    assert not tr.get_property("recording")
    for s in (s1, s2, s3):
        bufs, saw_eos = s.recv_buffers()
        assert_timeline(bufs, 10)
        assert saw_eos


def test_three_stream_main_and_second_eos():
    tr = make_togglerecord()
    s1 = Sender(tr, True)
    s2 = Sender(tr, False)
    s3 = Sender(tr, False)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 9)
    s3.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done(); s3.wait_done()
    s1.send(EOS); s1.wait_done()
    assert tr.get_property("recording")
    s2.send(EOS); s2.wait_done()
    assert tr.get_property("recording")
    s3.send(BUFFERS, 2); s3.wait_done()
    s3.send(TERMINATE); s3.wait_done()
    assert not tr.get_property("recording")
    bufs1, saw_eos = s1.recv_buffers()
    assert_timeline(bufs1, 10); assert saw_eos
    bufs2, saw_eos = s2.recv_buffers()
    assert_timeline(bufs2, 9); assert saw_eos
    bufs3, saw_eos = s3.recv_buffers()
    assert_timeline(bufs3, 10); assert saw_eos


def test_three_stream_secondary_eos_first():
    tr = make_togglerecord()
    s1 = Sender(tr, True)
    s2 = Sender(tr, False)
    s3 = Sender(tr, False)
    tr.set_property("record", True)
    s1.send(BUFFERS, 10)
    s2.send(BUFFERS, 9)
    s3.send(BUFFERS, 9)
    s1.wait_done(); s2.wait_done(); s3.wait_done()
    s2.send(EOS); s2.wait_done()
    s3.send(EOS); s3.wait_done()
    assert tr.get_property("recording")
    s1.send(EOS); s1.wait_done()
    assert not tr.get_property("recording")
    bufs1, saw_eos = s1.recv_buffers()
    assert_timeline(bufs1, 10); assert saw_eos
    for s in (s2, s3):
        bufs, saw_eos = s.recv_buffers()
        assert_timeline(bufs, 9)
        assert saw_eos
