"""Tracer subsystem tests (utils/tracers analog, GSTPU_TRACERS activation)."""
import os

import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.utils.tracers import (
    PipelineSnapshotTracer,
    parse_tracer_spec,
)


def test_parse_spec():
    tracers = parse_tracer_spec("queue-levels(file=/tmp/x.csv);pad-push-timings(file=/tmp/y.csv)")
    assert len(tracers) == 2
    assert tracers[0].name == "queue-levels"
    for t in tracers:
        t.close()
    os.unlink("/tmp/x.csv")
    os.unlink("/tmp/y.csv")


def test_parse_spec_rejects_unknown():
    with pytest.raises(ValueError):
        parse_tracer_spec("nope(file=x)")


def test_env_activation_pad_push_timings(tmp_path, monkeypatch):
    csv = tmp_path / "pushes.csv"
    monkeypatch.setenv("GSTPU_TRACERS", f"pad-push-timings(file={csv})")
    p = parse_launch("audiotestsrc num-buffers=3 samplesperbuffer=256 ! identity ! fakesink")
    p.play_until_eos()
    for t in p.tracers:
        t.close()
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "wallclock,element,pad,pts,frames"
    # 3 buffers into identity + 3 into fakesink
    assert len(lines) >= 7
    assert any(",identity" in l for l in lines)


def test_queue_levels_tracer(tmp_path, monkeypatch):
    csv = tmp_path / "levels.csv"
    monkeypatch.setenv("GSTPU_TRACERS", f"queue-levels(file={csv})")
    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=300 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! audiornnoise ! fakesink"
    )
    p.play_until_eos()
    for t in p.tracers:
        t.close()
    lines = csv.read_text().strip().splitlines()
    assert any("audiornnoise" in l for l in lines)


def test_pipeline_snapshot(tmp_path):
    p = parse_launch("audiotestsrc num-buffers=1 ! identity name=mid ! fakesink")
    tr = PipelineSnapshotTracer()
    tr.attach(p)
    out = tr.snapshot(str(tmp_path / "pipe.dot"))
    dot = open(out).read()
    assert "digraph pipeline" in dot
    assert '"mid"' in dot
    assert "->" in dot


def test_memory_tracer(tmp_path):
    import gst_plugins_rs_tpu as fx
    from gst_plugins_rs_tpu.utils.tracers import MemoryTracer

    t = MemoryTracer(file=str(tmp_path / "mem.csv"))
    p = fx.parse_launch(
        "audiotestsrc num-buffers=3 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 ! fakesink"
    )
    p.add_tracer(t)
    p.play_until_eos()
    t.close()
    lines = (tmp_path / "mem.csv").read_text().strip().splitlines()
    assert lines[0] == "element,buffers,bytes"
    assert any("fakesink" in l and ",3," in l for l in lines)


def test_chrome_tracer(tmp_path):
    import json

    import gst_plugins_rs_tpu as fx
    from gst_plugins_rs_tpu.utils.tracers import ChromeTracer

    t = ChromeTracer(file=str(tmp_path / "trace.json"))
    p = fx.parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! fakesink"
    )
    p.add_tracer(t)
    p.play_until_eos()
    t.close()
    events = json.loads((tmp_path / "trace.json").read_text())["traceEvents"]
    assert events and all(e["ph"] == "i" for e in events)
    assert any("fakesink" in e["name"] for e in events)


def test_pcap_writer(tmp_path):
    import struct


    import gst_plugins_rs_tpu as fx
    from gst_plugins_rs_tpu.utils.tracers import PcapWriterTracer

    t = PcapWriterTracer(file=str(tmp_path / "cap.pcap"))
    p = fx.parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=800 "
        "! audio/x-raw,format=S16,rate=8000,channels=1 "
        "! mulawenc ! rtppcmupay2 ssrc=1 ! fakesink"
    )
    p.add_tracer(t)
    p.play_until_eos()
    t.close()
    data = (tmp_path / "cap.pcap").read_bytes()
    magic, _maj, _min = struct.unpack_from("<IHH", data)
    assert magic == 0xA1B2C3D4
    # at least the 2 RTP packets got captured with ethernet framing
    assert data[24:].count(b"\x08\x00\x45") >= 2


def test_fmt_tracer_writes_lines(tmp_path):
    import gst_plugins_rs_tpu as fx

    out = tmp_path / "fmt.log"
    import os
    os.environ["GSTPU_TRACERS"] = f"fmt-tracer(file={out})"
    try:
        p = fx.parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 ! fakesink")
        p.play_until_eos()
        for t in p.tracers:
            t.close()
    finally:
        del os.environ["GSTPU_TRACERS"]
    lines = out.read_text().splitlines()
    assert len(lines) >= 3
    assert "INFO buffer" in lines[0] and "pts=" in lines[0]


def test_py_tracing_bridges_to_logging(caplog):
    import logging

    import gst_plugins_rs_tpu as fx
    import os

    os.environ["GSTPU_TRACERS"] = "py-tracing(level=INFO)"
    try:
        with caplog.at_level(logging.INFO, logger="gstpu.trace"):
            p = fx.parse_launch(
                "audiotestsrc num-buffers=2 samplesperbuffer=480 "
                "! audio/x-raw,format=F32,rate=48000,channels=1 ! fakesink")
            p.play_until_eos()
    finally:
        del os.environ["GSTPU_TRACERS"]
    recs = [r for r in caplog.records if r.name.startswith("gstpu.trace.")]
    assert recs
    assert hasattr(recs[0], "frames")


def test_perfetto_tracer_emits_loadable_json(tmp_path):
    import json

    import gst_plugins_rs_tpu as fx
    import os

    out = tmp_path / "t.perfetto-trace.json"
    os.environ["GSTPU_TRACERS"] = f"perfetto-tracer(file={out})"
    try:
        p = fx.parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 ! fakesink")
        p.play_until_eos()
        for t in p.tracers:
            t.close()
    finally:
        del os.environ["GSTPU_TRACERS"]
    data = json.loads(out.read_text())
    assert data["traceEvents"]
