"""fallbackswitch scenario suite, mirrored 1:1 from the reference's
`/root/reference/utils/fallbackswitch/tests/fallbackswitch.rs` (693 lines,
17 tests): main/fallback video inputs (320x240 vs 160x120 RGBA frames, 1 s
apart) on a TestClock, timeout-driven failover, recovery, initial timeout,
immediate-fallback and manual (auto-switch=false) switching, with EOS on
the fallback never required to end the stream.

live/not_live adaptation: the reference toggles appsrc is-live, which
changes when the aggregator clock task sees each frame.  This element is
push-driven, so the live variants advance the TestClock to each frame's
time BEFORE pushing (frames arrive on time) and the not_live variants push
ahead of the clock — the two real orderings the reference's pacing
produces.
"""
import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    FlowReturn,
    Pad,
    PadDirection,
    SECOND,
    Segment,
    State,
    TestClock,
    element_factory_make,
)

MS = SECOND // 1000
LATENCY = 10 * MS
# fallback activates after this long without data on the active input; the
# reference's pipeline observes activation at the 3rd missed second
TIMEOUT = 2_500 * MS

MAIN_SIZE = 320 * 240 * 4
FALLBACK_SIZE = 160 * 120 * 4


def _feed(fs, pad, w, h):
    src = Pad("src", PadDirection.SRC)
    src.link(pad)
    src.push_event(Event.new_stream_start("s"))
    src.push_event(Event.new_caps(Caps.builder(
        "video/x-raw", format="RGBA", width=w, height=h)))
    src.push_event(Event.new_segment(Segment()))
    return src


class Ctx:
    def __init__(self, immediate_fallback=False, auto_switch=True):
        self.tc = TestClock()
        self.fs = element_factory_make("fallbackswitch")
        self.fs.set_property("timeout", TIMEOUT)
        if immediate_fallback:
            self.fs.set_property("immediate-fallback", True)
        if not auto_switch:
            self.fs.set_property("auto-switch", False)
        self.out = []
        self.events = []
        cap = Pad("cap", PadDirection.SINK)
        cap.chain_function = lambda pad, b: (self.out.append(b),
                                             FlowReturn.OK)[1]
        cap.event_function = lambda pad, e: (self.events.append(e), True)[1]
        self.fs.srcpad.link(cap)
        self.main = self.fs.request_sink_pad()
        self.fallback = self.fs.request_sink_pad()
        self.fs.clock = self.tc
        self.fs.set_state(State.PLAYING)
        self.fmain = _feed(self.fs, self.main, 320, 240)
        self.ffallback = _feed(self.fs, self.fallback, 160, 120)
        self._pulled = 0

    def push(self, ts):
        self.fmain.push(Buffer(np.zeros((240, 320, 4), np.uint8), pts=ts,
                               duration=SECOND))

    def push_fallback(self, ts):
        self.ffallback.push(Buffer(np.zeros((120, 160, 4), np.uint8),
                                   pts=ts, duration=SECOND))

    def set_time(self, t):
        if t > self.tc.now():
            self.tc.set_time(t)

    def pull(self):
        assert self._pulled < len(self.out), \
            f"no buffer to pull (have {len(self.out)}, took {self._pulled})"
        b = self.out[self._pulled]
        self._pulled += 1
        return b

    def no_more_buffers(self):
        return self._pulled == len(self.out)

    def push_eos(self):
        self.fmain.push_event(Event.new_eos())

    def push_fallback_eos(self):
        self.ffallback.push_event(Event.new_eos())

    def assert_eos(self):
        from gst_plugins_rs_tpu.core import EventType

        assert any(e.type == EventType.EOS for e in self.events), \
            "EOS must reach downstream"


def assert_buffer(b, ts):
    assert b.pts == ts, (b.pts, ts)
    assert np.asarray(b.data).size == MAIN_SIZE


def assert_fallback_buffer(b, ts):
    assert b.pts == ts, (b.pts, ts)
    assert np.asarray(b.data).size == FALLBACK_SIZE


def test_no_fallback_no_drops():
    """Single (main-only) stream passes through untouched."""
    c = Ctx()
    for i in range(3):
        c.push(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert_buffer(c.pull(), i * SECOND)
    c.push_eos()
    c.assert_eos()


def _no_drops(live):
    c = Ctx()
    for i in range(3):
        if live:
            c.set_time(i * SECOND)
        c.push(i * SECOND)
        c.push_fallback(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert_buffer(c.pull(), i * SECOND)
    assert c.no_more_buffers()  # fallback frames never leak through
    # EOS on the fallback should not be required
    c.push_eos()
    c.assert_eos()


def test_no_drops_live():
    _no_drops(True)


def test_no_drops_not_live():
    _no_drops(False)


def _no_drops_but_no_fallback_frames(live):
    c = Ctx()
    for i in range(3):
        if live:
            c.set_time(i * SECOND)
        c.push(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert_buffer(c.pull(), i * SECOND)
    c.push_eos()
    c.assert_eos()


def test_no_drops_but_no_fallback_frames_live():
    _no_drops_but_no_fallback_frames(True)


def test_no_drops_but_no_fallback_frames_not_live():
    _no_drops_but_no_fallback_frames(False)


def _short_drop(live):
    """One missed main frame is bridged without switching."""
    c = Ctx()
    c.push(0)
    c.push_fallback(0)
    c.set_time(LATENCY)
    assert_buffer(c.pull(), 0)

    # main misses 1s: the fallback frame is consumed but NOT output
    c.push_fallback(1 * SECOND)
    c.set_time(1 * SECOND + LATENCY)
    assert c.no_more_buffers()

    c.push_fallback(2 * SECOND)
    if live:
        c.set_time(2 * SECOND)
    c.push(2 * SECOND)
    c.set_time(2 * SECOND + LATENCY)
    assert_buffer(c.pull(), 2 * SECOND)

    c.push_eos()
    c.push_fallback_eos()
    c.assert_eos()


def test_short_drop_live():
    _short_drop(True)


def test_short_drop_not_live():
    _short_drop(False)


def _drive_long_drop(c, live):
    c.push(0)
    c.push_fallback(0)
    c.set_time(0)
    assert_buffer(c.pull(), 0)

    # frames 1-2 only from the fallback: under the timeout, not output
    for i in (1, 2):
        c.push_fallback(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert c.no_more_buffers()

    # frames 3-4 only from the fallback: the timeout has expired, output
    for i in (3, 4):
        c.push_fallback(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert_fallback_buffer(c.pull(), i * SECOND)


def _long_drop_and_eos(live):
    c = Ctx()
    _drive_long_drop(c, live)
    c.push_eos()
    c.push_fallback_eos()
    c.assert_eos()


def test_long_drop_and_eos_live():
    _long_drop_and_eos(True)


def test_long_drop_and_eos_not_live():
    _long_drop_and_eos(False)


def _long_drop_and_recover(live):
    c = Ctx()
    _drive_long_drop(c, live)

    # the main input produces again: healthy, wins back immediately
    c.push(5 * SECOND)
    c.set_time(5 * SECOND + LATENCY)
    assert_buffer(c.pull(), 5 * SECOND)
    assert not c.main.timed_out
    assert c.main.is_healthy

    # main only, no fallback frame: still output immediately
    c.push(6 * SECOND)
    c.set_time(6 * SECOND + LATENCY)
    assert_buffer(c.pull(), 6 * SECOND)

    c.push(7 * SECOND)
    c.push_fallback(7 * SECOND)
    c.set_time(7 * SECOND + LATENCY)
    assert_buffer(c.pull(), 7 * SECOND)

    c.push_eos()
    c.push_fallback_eos()
    c.assert_eos()


def test_long_drop_and_recover_live():
    _long_drop_and_recover(True)


def test_long_drop_and_recover_not_live():
    _long_drop_and_recover(False)


def _initial_timeout(live):
    """No main frame EVER: the fallback takes over once the initial
    timeout expires."""
    c = Ctx()
    for i in (0, 1, 2):
        c.push_fallback(i * SECOND)
        c.set_time(i * SECOND + (LATENCY if i else 0))
    assert c.no_more_buffers()

    for i in (3, 4):
        c.push_fallback(i * SECOND)
        c.set_time(i * SECOND + LATENCY)
        assert_fallback_buffer(c.pull(), i * SECOND)

    c.push_eos()
    c.push_fallback_eos()
    c.assert_eos()


def test_initial_timeout_live():
    _initial_timeout(True)


def test_initial_timeout_not_live():
    _initial_timeout(False)


def _immediate_fallback(live):
    """immediate-fallback=true: the first fallback frame is output without
    waiting out the timeout."""
    c = Ctx(immediate_fallback=True)
    c.push_fallback(0)
    c.set_time(0)
    assert_fallback_buffer(c.pull(), 0)
    c.push_eos()
    c.push_fallback_eos()
    c.assert_eos()


def test_immediate_fallback_live():
    _immediate_fallback(True)


def test_immediate_fallback_not_live():
    _immediate_fallback(False)


def _manual_switch(live):
    c = Ctx(auto_switch=False)
    c.fs.set_property("active-pad", c.main)
    c.push(0)
    c.push_fallback(0)
    c.set_time(LATENCY)
    assert_buffer(c.pull(), 0)

    c.fs.set_property("active-pad", c.fallback)
    c.push_fallback(1 * SECOND)
    c.push(1 * SECOND)
    c.set_time(1 * SECOND + LATENCY)
    b = c.pull()
    if b.pts == 0:  # the fallback's held frame may flush first
        b = c.pull()
    assert_fallback_buffer(b, 1 * SECOND)

    c.fs.set_property("active-pad", c.main)
    c.push(2 * SECOND)
    c.push_fallback(2 * SECOND)
    c.set_time(2 * SECOND + LATENCY)
    b = c.pull()
    if b.pts == 1 * SECOND:  # the main's held frame may flush first
        b = c.pull()
    assert_buffer(b, 2 * SECOND)

    # EOS on the fallback should not be required
    c.push_eos()
    c.assert_eos()


def test_manual_switch_live():
    _manual_switch(True)


def test_manual_switch_not_live():
    _manual_switch(False)


def test_failover_after_active_eos():
    """With stop-on-eos=false, the active input's EOS forwards downstream
    but the element keeps running: once the timeout retires the ended
    input, a healthy lower-priority input takes over and the stream
    restarts (review finding r5: EOS used to latch the element shut)."""
    from gst_plugins_rs_tpu.core import EventType

    c = Ctx()
    c.push(0)
    c.push_fallback(0)
    c.set_time(LATENCY)
    assert_buffer(c.pull(), 0)

    c.push_eos()  # the active (main) input ends
    assert any(e.type == EventType.EOS for e in c.events)

    # the timeout retires the EOS'd input; the fallback takes over and the
    # downstream stream restarts (stream-start + segment re-pushed); the
    # frame it held while inactive flushes first, then fresh ones flow
    c.set_time(TIMEOUT + SECOND)
    assert_fallback_buffer(c.pull(), 0)
    c.push_fallback(4 * SECOND)
    assert_fallback_buffer(c.pull(), 4 * SECOND)
    types = [e.type for e in c.events]
    eos_at = types.index(EventType.EOS)
    assert EventType.STREAM_START in types[eos_at:]


def test_stop_on_eos_stops_for_good():
    c = Ctx()
    c.fs.set_property("stop-on-eos", True)
    c.push(0)
    c.push_fallback(0)
    c.set_time(LATENCY)
    assert_buffer(c.pull(), 0)
    c.push_eos()
    c.set_time(TIMEOUT + SECOND)
    c.push_fallback(4 * SECOND)
    assert c.no_more_buffers()  # nothing may take over
