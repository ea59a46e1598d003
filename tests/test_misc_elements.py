"""Tests for the generic/text/utils element batch: file IO, inter bridge,
compression, originalbuffer stash, text transforms, fallbackswitch, livesync,
togglerecord, and the registry dump."""
import json

import numpy as np

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    FlowReturn,
    Harness,
    MessageType,
    Pad,
    PadDirection,
    SECOND,
    Segment,
    element_factory_make,
)

MS = SECOND // 1000


def test_filesrc_filesink_roundtrip(tmp_path):
    src_file = tmp_path / "in.bin"
    dst_file = tmp_path / "out.bin"
    payload = bytes(range(256)) * 100
    src_file.write_bytes(payload)
    p = parse_launch(
        f"rsfilesrc location={src_file} blocksize=1000 ! rsfilesink location={dst_file}"
    )
    p.play_until_eos()
    assert dst_file.read_bytes() == payload


def test_inter_bridge():
    p1 = parse_launch(
        "audiotestsrc wave=sine num-buffers=4 samplesperbuffer=480 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 ! intersink producer-name=ch1"
    )
    p1.play_until_eos()
    p2 = parse_launch("intersrc producer-name=ch1 ! appsink name=sink")
    p2.play_until_eos()
    sink = p2.by_name("sink")
    assert len(sink.samples) == 4
    assert sink.caps.structure(0)["rate"] == 48000


def test_compress_roundtrip():

    enc = element_factory_make("compressenc")
    h = Harness(enc)
    h.set_src_caps(Caps.builder("application/octet-stream"))
    payload = np.frombuffer(b"hello world " * 100, np.uint8)
    h.push(Buffer(payload, pts=0))
    comp = h.pull()
    assert comp.data.shape[0] < payload.shape[0]

    dec = element_factory_make("compressdec")
    h2 = Harness(dec)
    h2.set_src_caps(Caps.builder("application/octet-stream"))
    h2.push(comp)
    out = h2.pull()
    np.testing.assert_array_equal(np.asarray(out.data), payload)


def test_originalbuffer_save_restore():

    p = parse_launch(
        "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=480 volume=0.8 "
        "! audio/x-raw,format=F32,rate=48000,channels=1 "
        "! originalbuffersave ! agingradio seed=1 ! originalbufferrestore ! appsink name=sink"
    )
    p.play_until_eos()
    sink = p.by_name("sink")
    data = sink.concat_audio()
    n = np.arange(960)
    ref = (0.8 * np.sin(2 * np.pi * 440.0 * n / 48000.0)).astype(np.float32)
    np.testing.assert_allclose(data[:, 0], ref, atol=1e-6)  # pristine restored


def test_text_elements():
    elem = element_factory_make("regex")
    elem.set_property("pattern", "world")
    elem.set_property("replacement", "tpu")
    h = Harness(elem)
    h.set_src_caps(Caps.builder("text/x-raw", format="utf8"))
    h.push(Buffer("hello world", pts=0))
    assert h.pull().data == "hello tpu"

    w = element_factory_make("textwrap")
    w.set_property("columns", 5)
    hw = Harness(w)
    hw.set_src_caps(Caps.builder("text/x-raw", format="utf8"))
    hw.push(Buffer("aaa bbb ccc", pts=0))
    assert hw.pull().data == "aaa\nbbb\nccc"


def test_json_roundtrip():
    enc = element_factory_make("jsongstenc")
    h = Harness(enc)
    h.set_src_caps(Caps.builder("text/x-raw", format="utf8"))
    h.push(Buffer("caption", pts=123, duration=456))
    encoded = h.pull()
    rec = json.loads(str(encoded.data))
    assert rec == {"text": "caption", "pts": 123, "duration": 456}

    dec = element_factory_make("jsongstparse")
    h2 = Harness(dec)
    h2.set_src_caps(Caps.builder("application/x-json"))
    h2.push(encoded)
    out = h2.pull()
    assert out.data == "caption" and out.pts == 123 and out.duration == 456


def _feed(pad_owner, pad, bufs):
    src = Pad("feed", PadDirection.SRC)
    src.link(pad)
    src.push_event(Event.new_stream_start("s"))
    src.push_event(Event.new_caps(Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1, layout="interleaved")))
    src.push_event(Event.new_segment(Segment()))
    return src


def test_fallbackswitch_switches_on_health():
    fs = element_factory_make("fallbackswitch")
    out = []
    cap = Pad("cap", PadDirection.SINK)
    cap.chain_function = lambda pad, b: (out.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda pad, e: True
    fs.srcpad.link(cap)
    main = fs.request_sink_pad()
    backup = fs.request_sink_pad()
    fmain = _feed(fs, main, None)
    fbackup = _feed(fs, backup, None)

    fmain.push(Buffer(np.full((4, 1), 1.0, np.float32), pts=0))
    fbackup.push(Buffer(np.full((4, 1), 2.0, np.float32), pts=0))
    assert len(out) == 1 and float(np.asarray(out[0].data)[0, 0]) == 1.0

    fs.set_pad_healthy(main, False)
    fbackup.push(Buffer(np.full((4, 1), 2.0, np.float32), pts=10 * MS))
    vals = [float(np.asarray(b.data)[0, 0]) for b in out]
    assert vals[-1] == 2.0
    msgs = [m for m in fs.parent.bus.messages(MessageType.ELEMENT)] if fs.parent else []

    fs.set_pad_healthy(main, True)
    fmain.push(Buffer(np.full((4, 1), 1.0, np.float32), pts=20 * MS))
    vals = [float(np.asarray(b.data)[0, 0]) for b in out]
    assert vals[-1] == 1.0


def test_livesync_fills_gap():
    ls = element_factory_make("livesync")
    h = Harness(ls)
    h.set_src_caps(Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1, layout="interleaved"))
    h.push(Buffer(np.full((480, 1), 0.5, np.float32), pts=0, duration=10 * MS))
    h.push_event(Event.new_gap(10 * MS, 10 * MS))
    bufs = h.pull_all()
    assert len(bufs) == 2
    assert bufs[1].pts == 10 * MS
    # audio gaps repeat as SILENCE with the GAP flag
    # (livesync/imp.rs:1837-1848 fill_silence)
    from gst_plugins_rs_tpu.core import BufferFlags
    assert bufs[1].has_flag(BufferFlags.GAP)
    np.testing.assert_array_equal(np.asarray(bufs[1].data), 0.0)
    assert np.asarray(bufs[1].data).shape == np.asarray(bufs[0].data).shape


def test_togglerecord_closes_gaps():
    tr = element_factory_make("togglerecord")
    h = Harness(tr)
    h.set_src_caps(Caps.builder("audio/x-raw", format="F32", rate=48000, channels=1, layout="interleaved"))
    tr.set_property("record", True)
    h.push(Buffer(np.zeros((48, 1), np.float32), pts=0, duration=MS))
    tr.set_property("record", False)
    h.push(Buffer(np.zeros((48, 1), np.float32), pts=MS, duration=MS))  # dropped
    h.push(Buffer(np.zeros((48, 1), np.float32), pts=2 * MS, duration=MS))  # dropped
    tr.set_property("record", True)
    h.push(Buffer(np.zeros((48, 1), np.float32), pts=3 * MS, duration=MS))
    bufs = h.pull_all()
    assert [b.pts for b in bufs] == [0, MS]  # gap removed


def test_registry_dump():
    from gst_plugins_rs_tpu.utils.registry_dump import dump_registry

    data = dump_registry()
    assert len(data) >= 35
    ln = data["audioloudnorm"]
    assert ln["class"] == "Filter/Effect/Audio"
    names = {p["name"] for p in ln["properties"]}
    assert {"loudness-target", "loudness-range-target", "max-true-peak", "offset"} <= names
    assert any(p["direction"] == "sink" for p in ln["pads"])
