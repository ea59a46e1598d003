"""analyticscombiner / analyticssplitter tests (reference scenarios:
analytics/analytics/tests/analyticscombiner.rs batch semantics +
analyticssplitter.rs roundtrip)."""
import numpy as np

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    FlowReturn,
    Pad,
    PadDirection,
    SECOND,
    Segment,
    element_factory_make,
)
from gst_plugins_rs_tpu.elements.analytics.combiner import BatchMeta

MS = SECOND // 1000


def make_combiner(n_pads=2, **props):
    comb = element_factory_make("analyticscombiner")
    for k, v in props.items():
        comb.set_property(k.replace("_", "-"), v)
    srcs = []
    sinks = []
    out = []

    out_pad = Pad("capture", PadDirection.SINK)
    out_pad.chain_function = lambda pad, buf: (out.append(buf), FlowReturn.OK)[1]
    out_pad.event_function = lambda pad, ev: True
    comb.srcpad.link(out_pad)

    for i in range(n_pads):
        sink = comb.request_sink_pad()
        src = Pad(f"feed{i}", PadDirection.SRC)
        src.link(sink)
        src.push_event(Event.new_stream_start(f"s{i}"))
        src.push_event(Event.new_caps(Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1, layout="interleaved")))
        src.push_event(Event.new_segment(Segment()))
        srcs.append(src)
    return comb, srcs, out


def _buf(pts_ms, dur_ms=25, tag=0):
    return Buffer(np.full((4, 1), tag, np.float32), pts=pts_ms * MS, duration=dur_ms * MS)


def test_batches_by_window():
    comb, (a, b), out = make_combiner(2)
    # window 0: [0, 100ms)
    a.push(_buf(0))
    a.push(_buf(50))
    b.push(_buf(10))
    # pushing buffers of window 1 completes window 0
    a.push(_buf(100))
    b.push(_buf(120))
    assert len(out) == 1
    meta = out[0].get_meta(BatchMeta)
    assert [e.index for e in meta.streams] == [0, 1]
    assert len(meta.streams[0].buffers) == 2
    assert len(meta.streams[1].buffers) == 1
    assert out[0].pts == 0 and out[0].duration == 100 * MS


def test_eos_drains_partial_window():
    comb, (a, b), out = make_combiner(2)
    a.push(_buf(0))
    b.push(_buf(20))
    a.push_event(Event.new_eos())
    b.push_event(Event.new_eos())
    assert len(out) == 1
    meta = out[0].get_meta(BatchMeta)
    assert len(meta.streams[0].buffers) == 1


def test_strategy_first_in_batch():
    comb, (a,), out = make_combiner(1)
    comb.set_pad_strategy(comb.agg_pads()[0], "first-in-batch")
    a.push(_buf(0, tag=1))
    a.push(_buf(30, tag=2))
    a.push(_buf(60, tag=3))
    a.push(_buf(110, tag=4))
    assert len(out) == 1
    bufs = out[0].get_meta(BatchMeta).streams[0].buffers
    assert len(bufs) == 1
    assert float(np.asarray(bufs[0].data)[0, 0]) == 1.0


def test_strategy_last_in_batch():
    comb, (a,), out = make_combiner(1)
    comb.set_pad_strategy(comb.agg_pads()[0], "last-in-batch")
    a.push(_buf(0, tag=1))
    a.push(_buf(60, tag=2))
    a.push(_buf(110, tag=3))
    assert len(out) == 1
    bufs = out[0].get_meta(BatchMeta).streams[0].buffers
    assert len(bufs) == 1
    assert float(np.asarray(bufs[0].data)[0, 0]) == 2.0


def test_combiner_splitter_roundtrip():
    p = parse_launch(
        "audiotestsrc wave=sine num-buffers=8 samplesperbuffer=2400 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! analyticscombiner name=comb batch-duration=100000000 "
        "! analyticssplitter name=split "
        "audiotestsrc wave=silence num-buffers=8 samplesperbuffer=2400 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! comb."
    )
    split = p.by_name("split")
    # pre-create and link both splitter src pads to appsinks
    from gst_plugins_rs_tpu.elements.sinks import AppSink

    sinks = []
    for i in range(2):
        sink = AppSink(f"out{i}")
        p.add(sink)
        split._get_src(i).link(sink.sinkpad)
        sinks.append(sink)
    p.play_until_eos()
    # 8 buffers of 50 ms per stream; all must come out on the right pads
    assert len(sinks[0].samples) == 8
    assert len(sinks[1].samples) == 8
    assert np.abs(sinks[0].concat_audio()).max() > 0.1  # sine stream
    assert np.abs(sinks[1].concat_audio()).max() == 0.0  # silence stream
    # caps preserved through the batch
    assert sinks[0].caps.structure(0)["rate"] == 48000
