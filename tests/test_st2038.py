"""ST-2038 ancillary data tests: bit-level pack/unpack, caption wrap/
extract round trip, demux/mux, combiner/extractor."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.ops import cea608, st2038


class TestPackUnpack:
    def test_roundtrip(self):
        data = bytes(range(17))
        packed = st2038.pack(0x61, 0x02, data, c_not_y=True,
                             line_number=21, horizontal_offset=100)
        pkt, nxt = st2038.unpack(packed)
        assert nxt == len(packed)
        assert (pkt.did, pkt.sdid, pkt.data) == (0x61, 0x02, data)
        assert pkt.c_not_y and pkt.line_number == 21 and pkt.horizontal_offset == 100
        assert pkt.checksum_ok

    def test_multiple_packets(self):
        stream = st2038.pack(0x61, 0x01, b"AA") + st2038.pack(0x45, 0x01, b"BBB")
        pkts = st2038.unpack_all(stream)
        assert [(p.did, p.sdid) for p in pkts] == [(0x61, 0x01), (0x45, 0x01)]

    def test_corrupt_zero_bits(self):
        packed = bytearray(st2038.pack(0x61, 0x02, b"xy"))
        packed[0] |= 0x80
        with pytest.raises(ValueError):
            st2038.unpack(bytes(packed))

    def test_oversize_payload(self):
        with pytest.raises(ValueError):
            st2038.pack(0x61, 0x01, b"z" * 256)


class TestCaptionRoundtrip:
    def test_608_through_anc(self):
        pairs = cea608.encode_pop_on(["ANC CAPTION"])
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        wrap = fx.element_factory_make("cctost2038anc")
        wrap.set_property("line-number", 21)
        unwrap = fx.element_factory_make("st2038anctocc")
        dec = fx.element_factory_make("cea608tott")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, wrap, unwrap, dec, sink):
            p.add(e)
        src.link(wrap); wrap.link(unwrap); unwrap.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(np.asarray(pairs, np.uint8).reshape(-1, 2), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert [str(s.buffer.data) for s in sink.samples] == ["ANC CAPTION"]

    def test_708_cdp_passthrough(self):
        cdp = bytes([0x96, 0x69, 0x10, 0x5F, 0x43]) + bytes(11)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-708,format=cdp"))
        wrap = fx.element_factory_make("cctost2038anc")
        unwrap = fx.element_factory_make("st2038anctocc")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, wrap, unwrap, sink):
            p.add(e)
        src.link(wrap); wrap.link(unwrap); unwrap.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(cdp, np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert np.asarray(sink.samples[0].buffer.data).tobytes() == cdp
        assert sink.caps.structure(0).name == "closedcaption/x-cea-708"


class TestDemuxMux:
    def test_demux_by_did_sdid(self):
        stream = (st2038.pack(0x61, 0x02, b"\x80\x94\x20", line_number=21)
                  + st2038.pack(0x45, 0x01, b"\x01"))
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-st-2038"))
        demux = fx.element_factory_make("st2038ancdemux")
        sink_all = fx.element_factory_make("appsink", "all")
        sink_cc = fx.element_factory_make("appsink", "cc")
        p = fx.Pipeline()
        for e in (src, demux, sink_all, sink_cc):
            p.add(e)
        src.link(demux)
        demux.pad("src").link(sink_all.pad("sink"))
        demux.typed_pad_for(0x61, 0x02, 21, 0).link(sink_cc.pad("sink"))
        src.push_buffer(fx.Buffer(np.frombuffer(stream, np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink_all.samples) == 1  # passthrough of the whole buffer
        assert len(sink_cc.samples) == 1  # only the 0x61/0x02 packet
        pkt, _ = st2038.unpack(np.asarray(sink_cc.samples[0].buffer.data).tobytes())
        assert (pkt.did, pkt.sdid) == (0x61, 0x02)

    def test_mux_merges(self):
        mux = fx.element_factory_make("st2038ancmux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        srcs = []
        for i, (did, sdid) in enumerate([(0x61, 0x02), (0x45, 0x01)]):
            s = fx.element_factory_make("appsrc", f"s{i}")
            s.set_property("caps", parse_caps("meta/x-st-2038"))
            srcs.append((s, did, sdid))
        p.add(mux); p.add(sink)
        for s, _, _ in srcs:
            p.add(s)
        for s, did, sdid in srcs:
            s.pad("src").link(mux.request_sink_pad())
        mux.pad("src").link(sink.pad("sink"))
        for s, did, sdid in srcs:
            s.push_buffer(fx.Buffer(
                np.frombuffer(st2038.pack(did, sdid, b"x"), np.uint8), pts=0))
            s.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 2


class TestCombinerExtractor:
    def _run(self, extract_props=None):
        from gst_plugins_rs_tpu.elements.cc.st2038 import St2038AncMeta

        comb = fx.element_factory_make("st2038combiner")
        extract = fx.element_factory_make("st2038extractor")
        for k, v in (extract_props or {}).items():
            extract.set_property(k, v)
        vsink = fx.element_factory_make("appsink")
        ancsink = fx.element_factory_make("appsink")
        extract.on_pad_added = lambda pad: pad.link(ancsink.pad("sink"))
        p = fx.Pipeline()
        ancsrc = fx.element_factory_make("appsrc", "anc")
        ancsrc.set_property("caps", parse_caps("meta/x-st-2038"))
        vsrc = fx.element_factory_make("appsrc", "video")
        vsrc.set_property("caps", parse_caps("video/x-raw,format=RGB,width=8,height=8,framerate=30/1"))
        for e in (comb, extract, vsink, ancsink, ancsrc, vsrc):
            p.add(e)
        vsrc.pad("src").link(comb.pad("sink"))
        ancsrc.pad("src").link(comb.pad("st2038"))
        comb.pad("src").link(extract.pad("sink"))
        extract.pad("src").link(vsink.pad("sink"))
        anc = st2038.pack(0x61, 0x02, b"\x80\x94\x20", line_number=9)
        ancsrc.push_buffer(fx.Buffer(np.frombuffer(anc, np.uint8), pts=0))
        ancsrc.end_of_stream()
        vsrc.push_buffer(fx.Buffer(np.zeros((8, 8, 3), np.uint8), pts=0, duration=33_000_000))
        vsrc.end_of_stream()
        p.play_until_eos()
        return vsink, ancsink, anc, St2038AncMeta

    def test_attach_and_extract(self):
        # reference pad layout: video passes through src, ANC re-emitted
        # on the sometimes st2038 pad
        vsink, ancsink, anc, Meta = self._run()
        assert len(vsink.samples) == 1
        assert vsink.samples[0].buffer.data.shape == (8, 8, 3)
        assert vsink.samples[0].buffer.get_meta(Meta) is not None
        assert len(ancsink.samples) == 1
        assert np.asarray(ancsink.samples[0].buffer.data).tobytes() == anc

    def test_remove_ancillary_meta(self):
        vsink, ancsink, anc, Meta = self._run(
            {"remove-ancillary-meta": True})
        assert vsink.samples[0].buffer.get_meta(Meta) is None
        assert len(ancsink.samples) == 1


def test_anctocc_simultaneous_608_and_708():
    """Mixed ANC streams extract onto BOTH sometimes pads at once
    (st2038anctocc/imp.rs: per-kind src_cea608/src_cea708 pads)."""
    stream = (st2038.pack(0x61, 0x02, b"\x00\x94\x20", line_number=21)
              + st2038.pack(0x61, 0x01, bytes([0x96, 0x69, 0x10, 0x5F])))
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("meta/x-st-2038"))
    unwrap = fx.element_factory_make("st2038anctocc")
    s608 = fx.element_factory_make("appsink", "s608")
    s708 = fx.element_factory_make("appsink", "s708")
    p = fx.Pipeline()
    for e in (src, unwrap, s608, s708):
        p.add(e)
    src.link(unwrap)
    unwrap.link(s608)  # pending: attaches to the 608 pad when it appears
    unwrap.link(s708)
    src.push_buffer(fx.Buffer(np.frombuffer(stream, np.uint8), pts=0))
    src.end_of_stream()
    p.play_until_eos()
    assert np.asarray(s608.samples[0].buffer.data).tolist() == [[0x94, 0x20]]
    assert np.asarray(s708.samples[0].buffer.data).tobytes() == bytes(
        [0x96, 0x69, 0x10, 0x5F])
    assert s608.caps.structure(0).name == "closedcaption/x-cea-608"
    assert s708.caps.structure(0).name == "closedcaption/x-cea-708"
