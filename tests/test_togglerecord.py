"""togglerecord: synchronized multi-stream record valve.

Mirrors the reference's test strategy (utils/togglerecord/tests/tests.rs,
2260 LoC): per-stream sender threads push scheduled buffers through the
element while `record` toggles, and the tests assert which spans came out
on each stream, that secondary streams are clipped to the main stream's
recorded running-time spans, and that the output timeline is contiguous
(non-live) or untouched (is-live).
"""
import threading

import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    FlowReturn,
    Pad,
    PadDirection,
    State,
)
from gst_plugins_rs_tpu.core.buffer import BufferFlags
from gst_plugins_rs_tpu.core.events import QueryType, Segment
from gst_plugins_rs_tpu.core.registry import element_factory_make

MS = 1_000_000


class _StreamDriver:
    """Feeds one sink pad of togglerecord from its own thread and captures
    the paired src pad's output (the reference tests' sender-thread +
    harness-sink pattern, tests.rs setup_sender_receiver)."""

    def __init__(self, tr, sinkpad, srcpad, live_upstream=True):
        self.element = tr
        self.sink = sinkpad
        self.upstream = Pad(f"up-{sinkpad.name}", PadDirection.SRC)
        if live_upstream is not None:
            def _q(pad, query):
                if query.type == QueryType.LATENCY:
                    query.result.update(live=live_upstream, min_latency=0,
                                        max_latency=None)
                    return True
                return False
            self.upstream.query_function = _q
        self.upstream.link(sinkpad)
        self.downstream = Pad(f"down-{srcpad.name}", PadDirection.SINK)
        self.buffers = []
        self.events = []
        self.returns = []
        self.downstream.chain_function = lambda pad, b: (
            self.buffers.append(b), FlowReturn.OK)[1]
        self.downstream.event_function = lambda pad, e: (
            self.events.append(e), True)[1]
        srcpad.link(self.downstream)
        self.upstream.push_event(Event.new_stream_start(sinkpad.name))
        self.upstream.push_event(Event.new_segment(Segment()))
        self.thread = None

    def set_caps(self, caps):
        self.upstream.push_event(Event.new_caps(caps))

    def run(self, actions):
        """actions: list of Buffer | Event | callable (run inline)."""
        def _go():
            for a in actions:
                if callable(a):
                    a()
                elif isinstance(a, Buffer):
                    self.returns.append(self.upstream.push(a))
                else:
                    self.upstream.push_event(a)
        self.thread = threading.Thread(target=_go, daemon=True)
        self.thread.start()

    def join(self, timeout=20.0):
        self.thread.join(timeout)
        assert not self.thread.is_alive(), "stream driver stuck"

    def out_pts(self):
        return [b.pts for b in self.buffers]


def _make(record=False, is_live=False, n_secondary=0):
    tr = element_factory_make("togglerecord")
    tr.set_state(State.PLAYING)
    tr.set_property("record", record)
    if is_live:
        # is-live is only READY-mutable; set via the raw store like the
        # reference tests do before PLAYING
        tr._props["is-live"] = True
    main = _StreamDriver(tr, tr.pad("sink"), tr.pad("src"))
    secs = []
    for _ in range(n_secondary):
        sink = tr.request_sink_pad()
        secs.append(_StreamDriver(tr, sink, tr.pad(sink.name.replace("sink", "src"))))
    return tr, main, secs


def _buf(pts_ms, dur_ms=10, delta=False, frames=None, rate=None):
    if rate is not None:
        n = frames if frames is not None else int(dur_ms * rate / 1000)
        data = np.zeros((n, 1), np.float32)
    else:
        data = np.zeros(4, np.uint8)
    flags = BufferFlags.DELTA_UNIT if delta else BufferFlags.NONE
    return Buffer(data, pts=pts_ms * MS, duration=dur_ms * MS, flags=flags)


# -- single stream -----------------------------------------------------------------

def test_record_spans_are_contiguous():
    tr, main, _ = _make(record=True)
    main.run([
        _buf(0), _buf(10),
        lambda: tr.set_property("record", False),
        _buf(20), _buf(30),
        lambda: tr.set_property("record", True),
        _buf(40), _buf(50),
    ])
    main.join()
    # the two 20ms spans collapse into one contiguous 0..40ms timeline
    assert main.out_pts() == [0, 10 * MS, 20 * MS, 30 * MS]


def test_not_recording_drops_everything():
    tr, main, _ = _make(record=False)
    main.run([_buf(0), _buf(10), _buf(20)])
    main.join()
    assert main.buffers == []
    assert all(r == FlowReturn.OK for r in main.returns)


def test_recording_property_tracks_state():
    tr, main, _ = _make(record=True)
    assert tr.get_property("recording") is False  # nothing flowed yet
    main.run([_buf(0)])
    main.join()
    assert tr.get_property("recording") is True
    tr.set_property("record", False)
    main.run([_buf(10)])  # keyframe: stops right before it
    main.join()
    assert tr.get_property("recording") is False


def test_keyframe_gated_start():
    """Recording must start on a keyframe: delta units before it drop
    (imp.rs Starting state) and a force-key-unit event goes upstream."""
    tr, main, _ = _make(record=True)
    upstream_events = []
    main.upstream.event_function = lambda pad, e: (upstream_events.append(e), True)[1]
    main.run([
        _buf(0, delta=True), _buf(10, delta=True),  # dropped: waiting for K
        _buf(20),                                    # keyframe: starts here
        _buf(30, delta=True),
    ])
    main.join()
    assert main.out_pts() == [0, 10 * MS]  # 20ms..40ms rebased to 0
    assert any(e.get("name") == "GstForceKeyUnit" for e in upstream_events)


def test_stop_extends_to_next_keyframe():
    """record=false keeps passing delta units until the next keyframe,
    which is the first dropped buffer (imp.rs Stopping state)."""
    tr, main, _ = _make(record=True)
    main.run([
        _buf(0), _buf(10, delta=True),
        lambda: tr.set_property("record", False),
        _buf(20, delta=True), _buf(30, delta=True),  # still pass (no K yet)
        _buf(40),                                     # keyframe: stop before it
        _buf(50, delta=True),                         # dropped
    ])
    main.join()
    assert main.out_pts() == [0, 10 * MS, 20 * MS, 30 * MS]


def test_is_live_keeps_timestamps():
    tr, main, _ = _make(record=True, is_live=True)
    main.run([
        _buf(0),
        lambda: tr.set_property("record", False),
        _buf(10), _buf(20),
        lambda: tr.set_property("record", True),
        _buf(30),
    ])
    main.join()
    assert main.out_pts() == [0, 30 * MS]  # gap preserved


def test_restart_pushes_segment_and_discont():
    tr, main, _ = _make(record=True)
    main.run([
        _buf(0),
        lambda: tr.set_property("record", False),
        _buf(10),
        lambda: tr.set_property("record", True),
        _buf(20),
    ])
    main.join()
    assert main.buffers[-1].has_flag(BufferFlags.DISCONT)
    from gst_plugins_rs_tpu.core.events import EventType
    segs = [e for e in main.events if e.type == EventType.SEGMENT]
    assert len(segs) >= 2  # initial + restart


# -- main + secondary ------------------------------------------------------------

def test_secondary_clipped_to_main_span():
    """Secondary stream gets exactly the main stream's recorded span
    (tests.rs test_two_stream_open_close_open)."""
    tr, main, (sec,) = _make(record=False, n_secondary=1)
    main.run([
        _buf(0), _buf(10),
        lambda: tr.set_property("record", True),
        _buf(20), _buf(30), _buf(40),
        lambda: tr.set_property("record", False),
        _buf(50), _buf(60),
        Event.new_eos(),
    ])
    sec.run([_buf(t) for t in range(0, 70, 10)] + [Event.new_eos()])
    main.join(); sec.join()
    # main recorded [20,50)ms -> rebased to [0,30)
    assert main.out_pts() == [0, 10 * MS, 20 * MS]
    assert sec.out_pts() == [0, 10 * MS, 20 * MS]


def test_secondary_waits_for_main_decision():
    """A secondary buffer ahead of the main stream blocks until the main
    stream advances past it (imp.rs:115 'secondary streams are always
    behind main stream')."""
    tr, main, (sec,) = _make(record=True, n_secondary=1)
    order = []
    sec.run([_buf(0), lambda: order.append("sec-done")])
    import time
    time.sleep(0.3)
    assert order == []          # still blocked: main has no watermark yet
    main.run([_buf(0), _buf(10), lambda: order.append("main-done")])
    main.join(); sec.join()
    assert "sec-done" in order
    assert sec.out_pts() == [0]


def test_main_eos_drains_secondary():
    """After main EOS the secondary passes data up to the final recording
    stop, then goes EOS (imp.rs:860-1037)."""
    tr, main, (sec,) = _make(record=True, n_secondary=1)
    main.run([_buf(0), _buf(10), _buf(20), Event.new_eos()])
    sec.run([_buf(0), _buf(10), _buf(20), _buf(30), _buf(40)])
    main.join(); sec.join()
    # last_stop = 30ms (end of main's last buffer): 0,10,20 pass; 30 is EOS
    assert sec.out_pts() == [0, 10 * MS, 20 * MS]
    from gst_plugins_rs_tpu.core.events import EventType
    assert any(e.type == EventType.EOS for e in sec.events)
    assert FlowReturn.EOS in sec.returns


def test_main_eos_without_recording_ends_secondary():
    tr, main, (sec,) = _make(record=False, n_secondary=1)
    main.run([_buf(0), Event.new_eos()])
    main.join()
    sec.run([_buf(0)])
    sec.join()
    assert sec.buffers == []
    assert FlowReturn.EOS in sec.returns


def test_secondary_audio_clipped_sample_exact():
    """Raw-audio secondary buffers straddling a span boundary are trimmed
    to the exact sample (imp.rs:287-335 raw-audio clipping)."""
    rate = 48000
    tr, main, (sec,) = _make(record=False, n_secondary=1)
    sec.set_caps(Caps.builder("audio/x-raw", format="F32", rate=rate,
                              channels=1, layout="interleaved"))
    main.run([
        _buf(0),
        lambda: tr.set_property("record", True),
        _buf(10), _buf(20), _buf(30),
        lambda: tr.set_property("record", False),
        _buf(40), _buf(50),
        Event.new_eos(),
    ])
    # 20ms audio buffers at 0,20,40ms: recorded span is [10,40)ms so the
    # first and last overlap the boundaries and must be half-trimmed
    sec.run([_buf(t, dur_ms=20, rate=rate) for t in (0, 20, 40)]
            + [Event.new_eos()])
    main.join(); sec.join()
    lens = [b.data.shape[0] for b in sec.buffers]
    assert lens == [480, 960]  # 10ms tail of first + full middle buffer
    assert sec.buffers[0].pts == 0  # 10ms clip start rebased by -10ms offset


def test_three_streams_aligned():
    tr, main, secs = _make(record=False, n_secondary=2)
    main.run([
        _buf(0),
        lambda: tr.set_property("record", True),
        _buf(10), _buf(20),
        lambda: tr.set_property("record", False),
        _buf(30), _buf(40),
        Event.new_eos(),
    ])
    for s in secs:
        s.run([_buf(t) for t in range(0, 50, 10)] + [Event.new_eos()])
    main.join()
    for s in secs:
        s.join()
    assert main.out_pts() == [0, 10 * MS]
    for s in secs:
        assert s.out_pts() == [0, 10 * MS]


# -- non-live upstream: blocking semantics ---------------------------------------

def test_nonlive_upstream_blocks_instead_of_dropping():
    """With a non-live upstream nothing is dropped: the chain blocks until
    record=true and then everything passes (imp.rs:370-428)."""
    tr = element_factory_make("togglerecord")
    tr.set_state(State.PLAYING)
    tr.set_property("record", False)
    main = _StreamDriver(tr, tr.pad("sink"), tr.pad("src"),
                         live_upstream=False)
    main.run([_buf(0), _buf(10), _buf(20)])
    import time
    time.sleep(0.3)
    assert main.buffers == []          # blocked, not dropped
    assert main.thread.is_alive()
    tr.set_property("record", True)
    main.join()
    assert main.out_pts() == [0, 10 * MS, 20 * MS]


def test_secondary_requires_intra_only():
    # delta-unit rejection happens before any cross-stream synchronization,
    # so the secondary can be exercised standalone
    tr, main, _ = _make(record=True)
    sink = tr.request_sink_pad()
    sec = _StreamDriver(tr, sink, tr.pad("src_0"))
    ret = sec.upstream.push(_buf(0, delta=True))
    assert ret == FlowReturn.ERROR


def test_registry_pads():
    tr = element_factory_make("togglerecord")
    names = {(t[0], t[2]) for t in type(tr).EXTRA_PAD_TEMPLATES}
    assert ("sink_%u", "request") in names
    assert ("src_%u", "sometimes") in names
    pad = tr.request_pad("sink_%u")
    assert pad.name == "sink_0"
    assert tr.pad("src_0") is not None
