"""livesync scenario depth: 1:1 mirror of the reference suite
`/root/reference/utils/livesync/tests/livesync.rs` (448 lines), TestClock
driven (VERDICT r4 #6).

Scenario map (reference test name -> here):
  test_video_singlesegment / test_video_nonsinglesegment
  test_audio_singlesegment / test_audio_nonsinglesegment
      -> same 4 names, all driving _run_livesync (the reference's
         test_livesync body, livesync.rs:133-205): startup event order,
         DISCONT on the first buffer, per-slot pacing, GAP repeats with
         frozen offsets and advancing PTS over an upstream stall, silence
         fill for audio, late-buffer drops, MARKER preservation across the
         resync, EOS drain.
  segment_change_non_single_segment[_flag] / segment_change_single_segment
      -> same 3 names (livesync.rs:231-448): a mid-stream segment with
         start/stop/base, buffer clipping in single-segment mode, repeats
         continuing on the new segment, and EOS vs SEGMENT_DONE (matching
         seqnum) when the repeated timeline crosses the segment stop.

One documented divergence: the reference's crank-driven harness observes
one extra GAP repeat before the post-stall resync buffer (its gap-filler
clock wait is already pending when the late-resync buffers arrive, and its
src task races the pushes — 3 of the 4 variants are #[ignore]d as racy
upstream).  This implementation is deterministic: a queued on-time buffer
always wins its slot, so the first buffer after the stall is emitted in
that slot (with DISCONT, as in the reference).
"""
import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    BufferFlags,
    Caps,
    Event,
    EventType,
    Harness,
    SECOND,
    Segment,
    SegmentFlags,
    State,
    TestClock,
    element_factory_make,
)

MS = SECOND // 1000
DURATION = 100 * MS
LATENCY = 200 * MS


def _mk(singlesegment, latency=LATENCY, sync=True):
    tc = TestClock()
    ls = element_factory_make("livesync")
    ls.set_property("latency", latency)
    ls.set_property("single-segment", singlesegment)
    ls.set_property("sync", sync)
    h = Harness(ls, play=False)
    ls.clock = tc
    ls.set_state(State.PLAYING)
    return tc, ls, h


def _video_caps():
    return Caps.builder("video/x-raw", format="RGB", width=4, height=4,
                        framerate="10/1")


def _audio_caps():
    return Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1,
                        layout="interleaved")


def _video_buf(n):
    data = np.full((4, 4, 3), n % 256, np.uint8)
    return Buffer(data, pts=n * DURATION, duration=DURATION, offset=n)


def _audio_buf(n):
    data = np.full((4800, 1), 0.25, np.float32)
    return Buffer(data, pts=n * DURATION, duration=DURATION, offset=n * 4800)


def _crank_pull(tc, h):
    assert tc.crank(), "no pending clock wait"
    return h.pull()


def _assert_buf(buf, offset, pts, duration, flags):
    assert buf.offset == offset, f"bad offset {buf.offset} != {offset}"
    assert buf.pts == pts, f"bad pts {buf.pts} != {pts}"
    assert buf.duration == duration, f"bad duration {buf.duration}"
    assert buf.flags == flags, f"bad flags {buf.flags!r} != {flags!r}"


def _run_livesync(audio, singlesegment):
    """The reference's test_livesync body (livesync.rs:133-205)."""
    o = 4800 if audio else 1
    mkbuf = _audio_buf if audio else _video_buf
    tc, ls, h = _mk(singlesegment)
    h.set_src_caps(_audio_caps() if audio else _video_caps())

    def out_pts(n):
        return (LATENCY if singlesegment else 0) + n * DURATION

    # -- normal operation: push 0-1, crank, pull 0 -------------------------
    tc2, ls2, h2 = tc, ls, h
    h2.push(mkbuf(0))
    h2.push(mkbuf(1))
    # stream-start forwarded eagerly; caps+segment deferred to the first slot
    assert [e.type for e in h2.events] == [EventType.STREAM_START]
    b = _crank_pull(tc2, h2)
    # after the first crank the caps and segment precede buffer 0
    # (livesync.rs:139-143: caps are only output once the first-buffer wait
    # has finished)
    assert [e.type for e in h2.events] == [
        EventType.STREAM_START, EventType.CAPS, EventType.SEGMENT]
    _assert_buf(b, 0, out_pts(0), DURATION, BufferFlags.DISCONT)

    # push 2-10, pull 1-9
    for i in range(1, 10):
        h2.push(mkbuf(i + 1))
        b = _crank_pull(tc2, h2)
        _assert_buf(b, o * i, out_pts(i), DURATION, BufferFlags.NONE)

    # pull frame 10
    b = _crank_pull(tc2, h2)
    _assert_buf(b, o * 10, out_pts(10), DURATION, BufferFlags.NONE)

    # -- bridging gap: upstream stalls; slots 11-19 repeat frame 10 --------
    for i in range(11, 20):
        b = _crank_pull(tc2, h2)
        _assert_buf(b, o * 10, out_pts(i), DURATION, BufferFlags.GAP)
        if audio:
            np.testing.assert_array_equal(np.asarray(b.data), 0.0)

    # frames 11-19 arrive late: all regressed under late-threshold -> dropped
    drops_before = ls2.get_property("drop")
    for i in range(11, 20):
        h2.push(mkbuf(i))
    assert h2.pull_all() == []
    assert ls2.get_property("drop") == drops_before + 9

    # -- resync: frames 20-21 arrive on time, MARKER flagged ---------------
    for i in (20, 21):
        buf = mkbuf(i)
        buf.set_flag(BufferFlags.MARKER)
        h2.push(buf)
    # DIVERGENCE (see module docstring): frame 20 wins slot 20 directly
    b = _crank_pull(tc2, h2)
    _assert_buf(b, o * 20, out_pts(20),
                DURATION, BufferFlags.DISCONT | BufferFlags.MARKER)
    b = _crank_pull(tc2, h2)
    _assert_buf(b, o * 21, out_pts(21), DURATION, BufferFlags.MARKER)

    # push 23-30, pull 22-29
    h2.push(mkbuf(22))
    for i in range(22, 30):
        h2.push(mkbuf(i + 1))
        b = _crank_pull(tc2, h2)
        _assert_buf(b, o * i, out_pts(i), DURATION, BufferFlags.NONE)

    # -- EOS: the remaining queued frame drains, then EOS ------------------
    assert h2.push_eos()
    b = _crank_pull(tc2, h2)
    _assert_buf(b, o * 30, out_pts(30), DURATION, BufferFlags.NONE)
    assert h2.events[-1].type == EventType.EOS
    assert h2.try_pull() is None
    # counters: 22 real buffers in (0-10, 20-30), 9 drops, 9 duplicates
    assert ls2.get_property("in") == 22
    assert ls2.get_property("drop") == 9
    assert ls2.get_property("duplicate") == 9
    assert ls2.get_property("out") == 31


def test_video_singlesegment():
    _run_livesync(audio=False, singlesegment=True)


def test_video_nonsinglesegment():
    _run_livesync(audio=False, singlesegment=False)


def test_audio_singlesegment():
    _run_livesync(audio=True, singlesegment=True)


def test_audio_nonsinglesegment():
    _run_livesync(audio=True, singlesegment=False)


# -- segment change (livesync.rs:231-448) -----------------------------------

RATE = 44100
BUF_MS = 20
BUF_DURATION = BUF_MS * MS
BPF = BUF_MS * RATE // 1000  # samples per buffer
SECOND_SEG_START = BUF_MS * MS // 4  # 5 ms
LAST_BUFFER_START = 4 * BUF_MS * MS  # 80 ms


def _s8_buf(value, samples=BPF):
    return Buffer(np.full((samples, 1), value, np.int8), pts=0,
                  duration=BUF_DURATION)


def _segment_change(single_segment, segment_flags):
    tc, ls, h = _mk(single_segment, latency=BUF_DURATION)
    caps = Caps.builder("audio/x-raw", format="S8", channels=1, rate=RATE,
                        layout="interleaved")
    h.srcpad.push_event(Event.new_stream_start("seg-change"))
    h.srcpad.push_event(Event.new_caps(caps))
    seg1 = Segment()
    h.srcpad.push_event(Event.new_segment(seg1))

    h.push(_s8_buf(1))
    b = _crank_pull(tc, h)  # buffer 1 at its slot
    assert np.asarray(b.data)[0, 0] == 1
    assert b.has_flag(BufferFlags.DISCONT)
    seg_events = [e for e in h.events if e.type == EventType.SEGMENT]
    assert len(seg_events) == 1

    # two repeats: silence (byte 0), GAP flagged
    for _ in range(2):
        b = _crank_pull(tc, h)
        assert np.asarray(b.data)[0, 0] == 0
        assert b.has_flag(BufferFlags.GAP)

    # mid-stream segment 2: clipped start, stop, base at current running time
    seg2 = Segment(start=SECOND_SEG_START,
                   stop=SECOND_SEG_STOP(), base=tc.now(),
                   flags=segment_flags)
    seg2_event = Event.new_segment(seg2)
    h.srcpad.push_event(seg2_event)
    h.push(_s8_buf(2))

    b = _crank_pull(tc, h)
    assert np.asarray(b.data)[0, 0] == 2
    assert b.has_flag(BufferFlags.DISCONT)
    if single_segment:
        # clipped to the segment start (livesync.rs:388-393)
        assert b.duration == BUF_DURATION - SECOND_SEG_START
        # the single output segment is NOT replaced; seqnum is adopted
        assert len([e for e in h.events if e.type == EventType.SEGMENT]) == 1
    else:
        assert b.duration == BUF_DURATION
        segs = [e for e in h.events if e.type == EventType.SEGMENT]
        assert len(segs) == 2 and segs[-1].seqnum == seg2_event.seqnum

    # repeats continue from buf2 (silence, buf2's duration) until the
    # repeated timeline crosses the segment stop
    expect_dur = (BUF_DURATION - SECOND_SEG_START if single_segment
                  else BUF_DURATION)
    if single_segment:
        # unlimited output segment: repeats run until upstream ends the
        # stream; drive a few slots then EOS
        for _ in range(3):
            b = _crank_pull(tc, h)
            assert np.asarray(b.data)[0, 0] == 0
            assert b.duration == expect_dur
            assert b.has_flag(BufferFlags.GAP)
        h.push_eos()
        assert h.events[-1].type == EventType.EOS
        return

    # non-single-segment: the out segment carries seg2's stop
    end_types = (EventType.SEGMENT_DONE
                 if segment_flags & SegmentFlags.SEGMENT else EventType.EOS)
    saw_end = None
    for _ in range(16):
        if not tc.crank():
            break
        nb = h.try_pull()
        if nb is not None:
            assert np.asarray(nb.data)[0, 0] == 0
            assert nb.duration == expect_dur
        if h.events and h.events[-1].type == end_types:
            saw_end = h.events[-1]
            break
    assert saw_end is not None, f"expected {end_types} when repeats cross stop"
    # EOS/SEGMENT_DONE carries the segment event's seqnum (livesync.rs:433-436)
    assert saw_end.seqnum == seg2_event.seqnum
    if end_types == EventType.SEGMENT_DONE:
        assert saw_end.get("position") is not None


def SECOND_SEG_STOP():
    return LAST_BUFFER_START + BUF_MS * MS // 4  # 85 ms


def test_segment_change_non_single_segment():
    _segment_change(False, SegmentFlags.NONE)


def test_segment_change_non_single_segment_flag():
    _segment_change(False, SegmentFlags.SEGMENT)


def test_segment_change_single_segment():
    _segment_change(True, SegmentFlags.NONE)


# -- latency query (livesync src_query, imp.rs:965-1015) --------------------

def test_latency_query_adds_configured_latency():
    from gst_plugins_rs_tpu.core import FlowReturn, Pad, PadDirection, Query

    ls = element_factory_make("livesync")
    ls.set_property("latency", 150 * MS)
    src = Pad("up", PadDirection.SRC)
    src.link(ls.sink_pads()[0])

    def up_query(pad, q):
        q.result.update(live=True, min_latency=30 * MS, max_latency=None)
        return True

    src.query_function = up_query
    sink = Pad("down", PadDirection.SINK)
    sink.chain_function = lambda pad, b: FlowReturn.OK
    ls.src_pads()[0].link(sink)
    q = Query.new_latency()
    assert ls.src_pads()[0].query(q)
    assert q.result["min_latency"] == 180 * MS
