"""Compress element suite, mirrored 1:1 from the reference's
`/root/reference/generic/compress/tests/compress.rs` (882 lines, 33 tests):
frame counts, lossless integrity, file round-trips (raw concatenated
streams reassembled from arbitrary read chunks), compression levels,
original-caps embedding + srcpad caps restoration, fragmented-input
reassembly, meta propagation, corruption handling, and seek refusal —
for zlib, deflate and brotli.

Adaptation note: the reference's gdp_file_roundtrip tests carry the
compressed caps through gdppay/gdpdepay (elements from gst-plugins-bad,
not part of the reference tree); here the same caps-carrying transport is
the in-process intersink/intersrc bridge, which serializes caps with the
stream exactly like GDP does on a file.
"""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    EventType,
    FlowReturn,
    Harness,
    element_factory_make,
)
from gst_plugins_rs_tpu.core.buffer import Meta

ZLIB = ("zlibcompress", "zlibdecompress", "application/x-zlib-compressed")
DEFLATE = ("deflatecompress", "deflatedecompress",
           "application/x-deflate-compressed")
BROTLI = ("brotlicompress", "brotlidecompress",
          "application/x-brotli-compressed")


def compressible_data(size):
    return bytes(i % 100 for i in range(size))


def _fixed_caps():
    return Caps.builder("application/octet-stream")


def _compressed_caps(media_type):
    return Caps([type(Caps.builder(media_type).structures[0])(
        media_type, **{"original-caps": _fixed_caps()})])


def _enc_harness(c):
    h = Harness(element_factory_make(c[0]))
    h.set_src_caps(_fixed_caps())
    return h


def _dec_harness(c):
    h = Harness(element_factory_make(c[1]))
    h.set_src_caps(_compressed_caps(c[2]))
    return h


# -- frame count --------------------------------------------------------

def _frame_count(c):
    NUM = 5
    he = _enc_harness(c)
    for _ in range(NUM):
        he.push(Buffer(np.zeros(256, np.uint8)))
    compressed = he.pull_all()
    assert len(compressed) == NUM
    hd = _dec_harness(c)
    for b in compressed:
        hd.push(b)
    assert len(hd.pull_all()) == NUM


def test_zlib_frame_count():
    _frame_count(ZLIB)


def test_deflate_frame_count():
    _frame_count(DEFLATE)


def test_brotli_frame_count():
    _frame_count(BROTLI)


# -- data integrity -----------------------------------------------------

def _data_integrity(c):
    p = fx.parse_launch(
        "videotestsrc num-buffers=3 "
        "! video/x-raw,format=RGB,width=32,height=24,framerate=30/1 "
        "! tee name=t t. ! appsink name=original "
        f"t. ! {c[0]} ! {c[1]} ! appsink name=processed")
    p.play_until_eos()
    orig = [np.asarray(s.buffer.data).tobytes()
            for s in p.by_name("original").samples]
    proc = [np.asarray(s.buffer.data).tobytes()
            for s in p.by_name("processed").samples]
    assert len(orig) == len(proc) == 3
    for i, (o, q) in enumerate(zip(orig, proc)):
        assert o == q, f"frame {i} differs after compress -> decompress"


def test_zlib_data_integrity():
    _data_integrity(ZLIB)


def test_deflate_data_integrity():
    _data_integrity(DEFLATE)


def test_brotli_data_integrity():
    _data_integrity(BROTLI)


# -- caps-carrying transport round-trip (GDP analog: intersink/src) ------

def _gdp_file_roundtrip(c):
    NUM = 10
    chan = f"compress-{c[0]}"
    p1 = fx.parse_launch(
        f"videotestsrc num-buffers={NUM} "
        "! video/x-raw,format=RGB,width=32,height=24,framerate=30/1 "
        f"! {c[0]} ! intersink producer-name={chan}")
    p1.play_until_eos()
    p2 = fx.parse_launch(
        f"intersrc producer-name={chan} ! {c[1]} ! appsink name=sink")
    p2.play_until_eos()
    sink = p2.by_name("sink")
    assert len(sink.samples) == NUM
    # caps restored from original-caps through the transport
    out_caps = sink.caps or sink.samples[-1].caps
    assert out_caps is not None and \
        out_caps.structure(0).name == "video/x-raw"
    assert all(len(np.asarray(s.buffer.data).tobytes()) == 32 * 24 * 3
               for s in sink.samples)


def test_zlib_gdp_file_roundtrip():
    _gdp_file_roundtrip(ZLIB)


def test_deflate_gdp_file_roundtrip():
    _gdp_file_roundtrip(DEFLATE)


def test_brotli_gdp_file_roundtrip():
    _gdp_file_roundtrip(BROTLI)


# -- raw file round-trip (adapter reassembly from big read chunks) -------

def _raw_file_roundtrip(c, tmp_path):
    NUM = 10
    loc = tmp_path / "test.bin"
    p1 = fx.parse_launch(
        f"videotestsrc num-buffers={NUM} "
        "! video/x-raw,format=RGB,width=32,height=24,framerate=30/1 "
        f"! {c[0]} ! rsfilesink location={loc}")
    p1.play_until_eos()
    # one filesrc read may contain MANY concatenated compressed streams;
    # the decompressor re-splits them on stream boundaries
    p2 = fx.parse_launch(
        f"rsfilesrc location={loc} blocksize=65536 "
        f"! {c[1]} ! appsink name=sink")
    p2.play_until_eos()
    frames = [np.asarray(s.buffer.data).tobytes()
              for s in p2.by_name("sink").samples]
    assert len(frames) == NUM
    assert all(len(f) == 32 * 24 * 3 for f in frames)


def test_zlib_raw_file_roundtrip(tmp_path):
    _raw_file_roundtrip(ZLIB, tmp_path)


def test_deflate_raw_file_roundtrip(tmp_path):
    _raw_file_roundtrip(DEFLATE, tmp_path)


def test_brotli_raw_file_roundtrip(tmp_path):
    _raw_file_roundtrip(BROTLI, tmp_path)


# -- compression level ---------------------------------------------------

def _compression_level(c, low, high):
    data = np.frombuffer(compressible_data(4096), np.uint8)

    def size_at(level):
        e = element_factory_make(c[0])
        e.set_property("level", level)  # level is ready-mutable
        h = Harness(e)
        h.set_src_caps(_fixed_caps())
        h.push(Buffer(data))
        return np.asarray(h.pull().data).size

    assert size_at(high) <= size_at(low)


def test_zlib_compression_level():
    _compression_level(ZLIB, 1, 9)


def test_deflate_compression_level():
    _compression_level(DEFLATE, 1, 9)


def test_brotli_compression_level():
    _compression_level(BROTLI, 1, 11)


# -- original-caps embedded / srcpad caps restored ------------------------

def _original_caps_embedded(c):
    raw = Caps.builder("video/x-raw", format="RGB", width=320, height=240)
    h = Harness(element_factory_make(c[0]))
    h.srcpad.push_event(Event.new_stream_start("s"))
    h.srcpad.push_event(Event.new_caps(raw))
    caps_events = [e for e in h.events if e.type == EventType.CAPS]
    assert caps_events
    s = caps_events[-1].get("caps").structure(0)
    assert s.name == c[2]
    embedded = s.get("original-caps")
    assert embedded is not None and embedded.can_intersect(raw)


def test_zlib_original_caps_embedded():
    _original_caps_embedded(ZLIB)


def test_deflate_original_caps_embedded():
    _original_caps_embedded(DEFLATE)


def test_brotli_original_caps_embedded():
    _original_caps_embedded(BROTLI)


def _srcpad_caps_restored(c):
    raw = Caps.builder("video/x-raw", format="RGB", width=320, height=240)
    he = Harness(element_factory_make(c[0]))
    he.srcpad.push_event(Event.new_stream_start("s"))
    he.srcpad.push_event(Event.new_caps(raw))
    he.srcpad.push_event(Event.new_segment(
        __import__("gst_plugins_rs_tpu").core.Segment()))
    he.push(Buffer(np.zeros(320 * 240 * 3, np.uint8), pts=0))
    compressed = he.pull()
    compressed_caps = [e for e in he.events
                       if e.type == EventType.CAPS][-1].get("caps")

    hd = Harness(element_factory_make(c[1]))
    hd.srcpad.push_event(Event.new_stream_start("s"))
    hd.srcpad.push_event(Event.new_caps(compressed_caps))
    restored = [e for e in hd.events if e.type == EventType.CAPS][-1]
    assert restored.get("caps").can_intersect(raw)
    hd.srcpad.push_event(Event.new_segment(
        __import__("gst_plugins_rs_tpu").core.Segment()))
    hd.push(compressed)
    out = hd.pull()
    assert np.asarray(out.data).size == 320 * 240 * 3


def test_zlib_srcpad_caps_restored():
    _srcpad_caps_restored(ZLIB)


def test_deflate_srcpad_caps_restored():
    _srcpad_caps_restored(DEFLATE)


def test_brotli_srcpad_caps_restored():
    _srcpad_caps_restored(BROTLI)


# -- fragmented input reassembly ------------------------------------------

def _fragmented_input_reassembly(c, data_size):
    data = compressible_data(data_size)
    he = _enc_harness(c)
    he.push(Buffer(np.frombuffer(data, np.uint8)))
    compressed = np.asarray(he.pull().data).tobytes()
    mid = len(compressed) // 2

    hd = _dec_harness(c)
    hd.push(Buffer(np.frombuffer(compressed[:mid], np.uint8)))
    assert hd.try_pull() is None, "first half alone must not produce output"
    hd.push(Buffer(np.frombuffer(compressed[mid:], np.uint8)))
    out = hd.pull()
    assert np.asarray(out.data).tobytes() == data
    assert hd.try_pull() is None


def test_zlib_fragmented_input_reassembly():
    _fragmented_input_reassembly(ZLIB, 4096)


def test_deflate_fragmented_input_reassembly():
    _fragmented_input_reassembly(DEFLATE, 4096)


def test_brotli_fragmented_input_reassembly():
    _fragmented_input_reassembly(BROTLI, 4096)


# -- meta propagation ------------------------------------------------------

class _RefTimestampMeta(Meta):
    api = "reference-timestamp"

    def __init__(self, ts):
        self.ts = ts


def _meta_propagation(c):
    he = _enc_harness(c)
    buf = Buffer(np.frombuffer(compressible_data(10), np.uint8))
    buf.add_meta(_RefTimestampMeta(42))
    he.push(buf)
    compressed = he.pull()
    assert compressed.get_meta(_RefTimestampMeta) is not None, \
        "compressor must propagate metas"
    hd = _dec_harness(c)
    hd.push(compressed)
    out = hd.pull()
    meta = out.get_meta(_RefTimestampMeta)
    assert meta is not None and meta.ts == 42


def test_zlib_meta_propagation():
    _meta_propagation(ZLIB)


def test_deflate_meta_propagation():
    _meta_propagation(DEFLATE)


def test_brotli_meta_propagation():
    _meta_propagation(BROTLI)


# -- corruption ------------------------------------------------------------

def test_corruption_detected():
    """zlib integrity check (adler32/huffman): corrupted payload produces
    NO output buffers (compress/tests corruption_detected_impl)."""
    c = ZLIB
    he = _enc_harness(c)
    he.push(Buffer(np.frombuffer(compressible_data(1024), np.uint8)))
    compressed = bytearray(np.asarray(he.pull().data).tobytes())
    mid = len(compressed) // 2
    compressed[mid] ^= 0xFF
    compressed[mid + 1] ^= 0xFF
    hd = _dec_harness(c)
    hd.push(Buffer(np.frombuffer(bytes(compressed), np.uint8)))
    assert hd.try_pull() is None, "no buffer may flow on corruption"


def test_brotli_structural_corruption_flow_error():
    """Corrupting the brotli stream header is a structural failure: the
    chain returns a flow error."""
    c = BROTLI
    he = _enc_harness(c)
    data = bytes(range(256)) * 2
    he.push(Buffer(np.frombuffer(data, np.uint8)))
    compressed = bytearray(np.asarray(he.pull().data).tobytes())
    for i in range(4):
        compressed[i] ^= 0xFF
    hd = _dec_harness(c)
    ret = hd.push(Buffer(np.frombuffer(bytes(compressed), np.uint8)))
    assert ret == FlowReturn.ERROR
    assert hd.try_pull() is None


def test_brotli_large_output():
    """A decompressed payload far larger than the decoder's 256 KiB chunk
    exercises the NEEDS_MORE_OUTPUT loop."""
    c = BROTLI
    data = compressible_data(2 * 1024 * 1024)
    he = _enc_harness(c)
    he.push(Buffer(np.frombuffer(data, np.uint8)))
    hd = _dec_harness(c)
    hd.push(he.pull())
    assert np.asarray(hd.pull().data).tobytes() == data


# -- seek refusal ------------------------------------------------------------

def _seek_refused(c):
    hd = _dec_harness(c)
    seek = Event.new_seek(0)
    assert hd.element.src_pads()[0].send_event(seek) is False


def test_zlib_seek_refused():
    _seek_refused(ZLIB)


def test_deflate_seek_refused():
    _seek_refused(DEFLATE)


def test_brotli_seek_refused():
    _seek_refused(BROTLI)
