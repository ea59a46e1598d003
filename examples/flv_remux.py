"""FLV -> fragmented MP4 remux with independent verification."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.mux import reader
import struct


def make_flv(tags):
    out = bytearray(b"FLV\x01\x05" + struct.pack(">I", 9) + b"\x00\x00\x00\x00")
    for t, ts, body in tags:
        tag = bytearray([t]) + len(body).to_bytes(3, "big")
        tag += (ts & 0xFFFFFF).to_bytes(3, "big") + bytes([(ts >> 24) & 0xFF])
        tag += b"\x00\x00\x00" + body
        out += tag + struct.pack(">I", len(tag))
    return bytes(out)


avcc = bytes([1, 0x64, 0, 40, 0xFF, 0xE1])
tags = [(9, 0, bytes([0x17, 0x00, 0, 0, 0]) + avcc)]
tags += [(9, i * 33, bytes([0x17 if i == 0 else 0x27, 0x01, 0, 0, 0]) + f"frame{i}".encode() * 50)
         for i in range(30)]
flv = make_flv(tags)

src = fx.element_factory_make("appsrc")
src.set_property("caps", parse_caps("video/x-flv"))
demux = fx.element_factory_make("rsflvdemux")
mux = fx.element_factory_make("isofmp4mux")
mux.set_property("fragment-duration", 500_000_000)
sink = fx.element_factory_make("appsink")
p = fx.Pipeline()
for e in (src, demux, mux, sink):
    p.add(e)
src.link(demux)
demux.link(mux)
mux.srcpad.link(sink.pad("sink"))
src.push_buffer(fx.Buffer(np.frombuffer(flv, np.uint8)))
src.end_of_stream()
p.play_until_eos()

data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
tracks = reader.decode_tracks(reader.parse_boxes(data))
print("boxes:", reader.box_types(data)[:6], "...")
print("tracks:", [(t.sample_entry_type, t.timescale) for t in tracks])
print(f"remuxed {len(flv)} FLV bytes -> {len(data)} fMP4 bytes")
