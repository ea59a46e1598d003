"""CEA-708 tests: DTVCC codec, CDP framing, element chains, overlay."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.ops import cea708


class TestCodec:
    def test_dtvcc_roundtrip(self):
        blocks = cea708.encode_pop_on_text(["HELLO 708", "SECOND"])
        trips = []
        for b in blocks:
            trips += cea708.pack_dtvcc_packet(b)
        decoders = cea708.decode_dtvcc(cea708.parse_cc_data(b"".join(trips)))
        assert decoders[1].take_captions() == [["HELLO 708", "SECOND"]]

    def test_cdp_roundtrip_and_checksum(self):
        cc = cea708.cc_data_triplet(0, 0x94, 0x20) * 3
        cdp = cea708.build_cdp(cc, sequence=1234, fps=30)
        got, seq = cea708.parse_cdp(cdp)
        assert got == cc and seq == 1234
        bad = bytearray(cdp)
        bad[8] ^= 0xFF
        with pytest.raises(ValueError):
            cea708.parse_cdp(bytes(bad))

    def test_service_block_limits(self):
        with pytest.raises(ValueError):
            cea708.service_block(1, b"x" * 32)
        with pytest.raises(ValueError):
            cea708.service_block(64, b"x")

    def test_extended_service_numbers_round_trip(self):
        # CEA-708 §6.2.2: services 7..63 use the extended header byte
        blk = cea708.service_block(42, bytes([cea708.DLW, 0xFF]))
        assert blk[0] >> 5 == 7 and blk[1] == 42
        trips = b"".join(cea708.pack_dtvcc_packet(blk))
        decoders = cea708.decode_dtvcc(cea708.parse_cc_data(trips))
        assert 42 in decoders


class TestElements:
    def _text_pipeline(self, elems, text="CAPTION"):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, *elems, sink):
            p.add(e)
        chain = [src, *elems, sink]
        for a, b in zip(chain, chain[1:]):
            a.link(b)
        src.push_buffer(fx.Buffer(text, pts=0))
        src.end_of_stream()
        p.play_until_eos()
        return sink

    def test_tttocea708_decodable(self):
        sink = self._text_pipeline([fx.element_factory_make("tttocea708")],
                                   "HELLO\nWORLD")
        data = np.asarray(sink.samples[0].buffer.data).tobytes()
        dec = cea708.decode_dtvcc(cea708.parse_cc_data(data))
        assert dec[1].take_captions() == [["HELLO", "WORLD"]]
        assert sink.caps.structure(0)["format"] == "cc_data"

    def test_608_to_708_compat_and_translation(self):
        from gst_plugins_rs_tpu.ops import cea608

        pairs = cea608.encode_pop_on(["BRIDGED"])
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        conv = fx.element_factory_make("cea608tocea708")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, conv, sink):
            p.add(e)
        src.link(conv); conv.link(sink)
        src.push_buffer(fx.Buffer(np.asarray(pairs, np.uint8).reshape(-1, 2), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        trips = cea708.parse_cc_data(data)
        # 608 compatibility triplets preserved bit-exact
        compat = [(b1, b2) for v, t, b1, b2 in trips if t == 0]
        assert compat == [tuple(map(int, pr)) for pr in pairs]
        # and a service-1 translation decodes to the same text
        dec = cea708.decode_dtvcc(trips)
        assert dec[1].take_captions() == [["BRIDGED"]]

    def test_cdpserviceinject(self):
        enc = fx.element_factory_make("tttocea708")
        inject = fx.element_factory_make("cdpserviceinject")
        inject.set_property("language", "spa")
        sink = self._text_pipeline([enc, inject])
        data = np.asarray(sink.samples[0].buffer.data).tobytes()
        assert data[:2] == b"\x96\x69"
        assert b"spa" in data
        cc, seq = cea708.parse_cdp(data)  # checksum validates
        assert seq == 0
        assert sink.caps.structure(0)["format"] == "cdp"

    def test_cea708mux(self):
        mux = fx.element_factory_make("cea708mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(mux); p.add(sink)
        mux.pad("src").link(sink.pad("sink"))
        srcs = []
        for i in range(2):
            s = fx.element_factory_make("appsrc", f"s{i}")
            s.set_property("caps", parse_caps("closedcaption/x-cea-708,format=cc_data"))
            p.add(s)
            s.pad("src").link(mux.request_sink_pad())
            srcs.append(s)
        for i, s in enumerate(srcs):
            blocks = cea708.encode_pop_on_text([f"SVC{i}"], service=i + 1)
            trips = b"".join(b"".join(cea708.pack_dtvcc_packet(b)) for b in blocks)
            s.push_buffer(fx.Buffer(np.frombuffer(trips, np.uint8), pts=0))
            s.end_of_stream()
        p.play_until_eos()
        data = b"".join(np.asarray(x.buffer.data).tobytes() for x in sink.samples)
        dec = cea708.decode_dtvcc(cea708.parse_cc_data(data))
        assert dec[1].take_captions() == [["SVC0"]]
        assert dec[2].take_captions() == [["SVC1"]]

    def test_overlay(self):
        overlay = fx.element_factory_make("cea708overlay")
        vsrc = fx.element_factory_make("videotestsrc")
        vsrc.set_property("pattern", "white")
        vsrc.set_property("num-buffers", 2)
        capsf = fx.element_factory_make("capsfilter")
        capsf.set_property("caps", parse_caps("video/x-raw,format=RGB,width=320,height=180,framerate=30/1"))
        ccsrc = fx.element_factory_make("appsrc")
        ccsrc.set_property("caps", parse_caps("closedcaption/x-cea-708,format=cc_data"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (ccsrc, vsrc, capsf, overlay, sink):
            p.add(e)
        vsrc.link(capsf)
        capsf.pad("src").link(overlay.pad("sink"))
        ccsrc.pad("src").link(overlay.pad("cc_sink"))
        overlay.pad("src").link(sink.pad("sink"))
        blocks = cea708.encode_pop_on_text(["ON SCREEN"])
        trips = b"".join(b"".join(cea708.pack_dtvcc_packet(b)) for b in blocks)
        ccsrc.push_buffer(fx.Buffer(np.frombuffer(trips, np.uint8), pts=0))
        ccsrc.end_of_stream()
        p.play_until_eos()
        f = np.asarray(sink.samples[-1].buffer.data)
        assert (f[120:, :, :] < 250).any()  # caption dims the white frame
        assert (f[:60] == 255).all()


class TestExtendedCharsets:
    def test_g2_roundtrip(self):
        from gst_plugins_rs_tpu.ops import cea708 as c708

        text = "caf… ‘quoted’ ™ œuvre ⅛"
        blocks = c708.encode_pop_on_text([text])
        # feed the service-block payloads straight into a decoder
        dec = c708.ServiceDecoder()
        for blk in blocks:
            dec.feed(blk[1:])  # strip service-block header
        caps = dec.take_captions()
        assert caps and caps[0][0] == text

    def test_unmappable_becomes_question_mark(self):
        from gst_plugins_rs_tpu.ops import cea708 as c708

        blocks = c708.encode_pop_on_text(["snowman ☃"])
        dec = c708.ServiceDecoder()
        for blk in blocks:
            dec.feed(blk[1:])
        assert dec.take_captions()[0][0] == "snowman ?"

    def test_c2_c3_skip_lengths(self):
        from gst_plugins_rs_tpu.ops import cea708 as c708

        dec = c708.ServiceDecoder()
        # EXT1 + C2 code 0x08 (one operand) then 'A'; EXT1 + C3 0x80 (4 ops) then 'B'
        dec.feed(bytes([0x10, 0x08, 0x00]) + b"A" + bytes([0x10, 0x80, 1, 2, 3, 4]) + b"B")
        rows = dec.rows
        assert rows[0] == "AB"

    def test_window_and_pen_style(self):
        from gst_plugins_rs_tpu.ops import cea708 as c708

        blocks = c708.encode_pop_on_text(["x"], window_style=2, pen_style=3)
        payload = b"".join(blk[1:] for blk in blocks)
        # DefineWindow byte 7 carries ws<<3 | ps
        dw = payload.index(bytes([c708.DF0]))
        assert payload[dw + 6] == (2 << 3) | 3
