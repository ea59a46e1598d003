"""togglerecord: synchronized multi-stream record valve.

A video-like main stream gates the recording (keyframe-aligned start and
stop) while a raw-audio secondary stream is clipped sample-exactly to the
recorded spans — the reference's `utils/togglerecord` model.  Toggling
`record` mid-stream yields one contiguous recorded timeline on both
streams.

Run from the repo root:  python examples/record_valve.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import threading
import time

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import Buffer, State
from gst_plugins_rs_tpu.core.buffer import BufferFlags
from gst_plugins_rs_tpu.core.events import Event, Segment
from gst_plugins_rs_tpu.core.parse import parse_caps

MS = 1_000_000
RATE = 48_000


def main() -> None:
    tr = fx.element_factory_make("togglerecord")
    tr.set_state(State.PLAYING)
    tr.set_property("record", False)

    # capture both outputs
    outs = {"video": [], "audio": []}
    from gst_plugins_rs_tpu.core import FlowReturn, Pad, PadDirection

    def tap(name, pad):
        sink = Pad(f"{name}-sink", PadDirection.SINK)
        sink.chain_function = lambda p, b: (outs[name].append(b), FlowReturn.OK)[1]
        sink.event_function = lambda p, e: True
        pad.link(sink)

    asink_pad = tr.request_sink_pad()  # audio as the secondary stream
    tap("video", tr.pad("src"))
    tap("audio", tr.pad("src_0"))

    def feed(sinkpad, make_buf, n, caps=None):
        up = Pad(f"feed-{sinkpad.name}", PadDirection.SRC)
        from gst_plugins_rs_tpu.core.events import QueryType

        def _q(pad, query):
            if query.type == QueryType.LATENCY:  # live upstream: drop mode
                query.result.update(live=True, min_latency=0, max_latency=None)
                return True
            return False

        up.query_function = _q
        up.link(sinkpad)
        up.push_event(Event.new_stream_start(sinkpad.name))
        if caps is not None:
            up.push_event(Event.new_caps(caps))
        up.push_event(Event.new_segment(Segment()))

        def _go():
            for i in range(n):
                up.push(make_buf(i))
                time.sleep(0.01)
            up.push_event(Event.new_eos())

        t = threading.Thread(target=_go, daemon=True)
        t.start()
        return t

    def video_buf(i):
        # keyframe every 5 frames, 20ms cadence
        flags = BufferFlags.NONE if i % 5 == 0 else BufferFlags.DELTA_UNIT
        return Buffer(np.zeros(16, np.uint8), pts=i * 20 * MS,
                      duration=20 * MS, flags=flags)

    def audio_buf(i):
        return Buffer(np.zeros((RATE // 50, 1), np.float32), pts=i * 20 * MS,
                      duration=20 * MS)

    tv = feed(tr.pad("sink"), video_buf, 50)
    ta = feed(asink_pad, audio_buf, 50,
              caps=parse_caps(f"audio/x-raw,format=F32,rate={RATE},channels=1"))

    time.sleep(0.15); tr.set_property("record", True)
    print("record=true (starts at the next keyframe)")
    time.sleep(0.25); tr.set_property("record", False)
    print("record=false (stops right before the next keyframe)")
    time.sleep(0.15); tr.set_property("record", True)
    print("record=true again")
    tv.join(20); ta.join(20)

    for kind in ("video", "audio"):
        pts = [b.pts // MS for b in outs[kind]]
        deltas = {b - a for a, b in zip(pts, pts[1:])}
        print(f"{kind}: {len(pts)} buffers out of 50, "
              f"pts {pts[0]}..{pts[-1]} ms, deltas {sorted(deltas)} ms "
              f"(contiguous timeline: {deltas == {20}})")
        assert deltas == {20}, "recorded timeline must be gap-free"
    audio_samples = sum(b.data.shape[0] for b in outs["audio"])
    print(f"audio recorded: {audio_samples} samples "
          f"({audio_samples * 1000 // RATE} ms), aligned to the video spans")


if __name__ == "__main__":
    main()
