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
