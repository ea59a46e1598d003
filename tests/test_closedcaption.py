"""Closed-caption family tests: CEA-608 codec, text<->608 element round
trips, SCC/MCC file formats, ccdetect messaging, and the device overlay.

Mirrors the reference tests (video/closedcaption/src/mcc_parse/parser.rs
inline tests, tttocea608/cea608tott integration tests): encode -> decode
round trips with pts bookkeeping.
"""
import json

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.elements.cc.files import (
    mcc_decode_payload,
    mcc_encode_payload,
)
from gst_plugins_rs_tpu.ops import cea608


class TestCodec:
    def test_parity(self):
        for b in range(0x80):
            p = cea608.with_parity(b)
            assert bin(p).count("1") % 2 == 1
            assert cea608.strip_parity(p) == b
        # corrupt parity is rejected
        assert cea608.strip_parity(cea608.with_parity(0x41) ^ 0x80) is None

    def test_pop_on_roundtrip(self):
        pairs = cea608.encode_pop_on(["HELLO WORLD", "SECOND LINE"])
        dec = cea608.Cea608Decoder()
        for hi, lo in pairs:
            dec.push_pair(hi, lo)
        (ev,) = dec.take_events()
        assert ev.lines == ["HELLO WORLD", "SECOND LINE"]
        assert ev.mode == "pop-on"

    def test_special_characters(self):
        pairs = cea608.encode_pop_on(["café niño"])
        dec = cea608.Cea608Decoder()
        for hi, lo in pairs:
            dec.push_pair(hi, lo)
        (ev,) = dec.take_events()
        assert ev.lines == ["café niño"]

    def test_roll_up_emits_on_cr(self):
        pairs = cea608.encode_roll_up("FIRST") + cea608.encode_roll_up("SECOND")
        dec = cea608.Cea608Decoder()
        for hi, lo in pairs:
            dec.push_pair(hi, lo)
        dec.flush()
        evs = dec.take_events()
        assert [e.lines for e in evs] == [["FIRST"], ["SECOND"]]
        assert all(e.mode == "roll-up" for e in evs)

    def test_erase_displayed_marker(self):
        pairs = cea608.encode_pop_on(["X"]) + cea608.erase_displayed()
        dec = cea608.Cea608Decoder()
        for hi, lo in pairs:
            dec.push_pair(hi, lo)
        evs = dec.take_events()
        assert evs[0].lines == ["X"] and evs[1] is None


class TestElements:
    def test_tt_to_608_to_tt_popon(self):
        src = fx.element_factory_make("appsrc")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        enc = fx.element_factory_make("tttocea608")
        enc.set_property("mode", "pop-on")
        dec = fx.element_factory_make("cea608tott")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dec, sink):
            p.add(e)
        src.link(enc); enc.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer("HELLO\nWORLD", pts=1_000_000_000))
        src.end_of_stream()
        p.play_until_eos()
        texts = [str(s.buffer.data) for s in sink.samples]
        assert texts == ["HELLO\nWORLD"]
        assert sink.samples[0].buffer.pts == 1_000_000_000

    def test_rollup_pipeline_and_json(self):
        src = fx.element_factory_make("appsrc")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        enc = fx.element_factory_make("tttocea608")  # default roll-up2
        dec = fx.element_factory_make("cea608tojson")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dec, sink):
            p.add(e)
        src.link(enc); enc.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer("NEWS AT TEN", pts=0))
        src.push_buffer(fx.Buffer("MORE NEWS", pts=2_000_000_000))
        src.end_of_stream()
        p.play_until_eos()
        recs = [json.loads(str(s.buffer.data)) for s in sink.samples]
        assert [r["lines"][0]["text"] for r in recs] == ["NEWS AT TEN", "MORE NEWS"]
        assert all(r["mode"] == "roll-up" for r in recs)

    def test_tt_json_vtt_chain(self):
        src = fx.element_factory_make("appsrc")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src.set_property("caps", parse_caps("text/x-raw,format=utf8"))
        p = fx.Pipeline()
        tojson = fx.element_factory_make("tttojson")
        tovtt = fx.element_factory_make("jsontovtt")
        sink = fx.element_factory_make("appsink")
        for e in (src, tojson, tovtt, sink):
            p.add(e)
        src.link(tojson); tojson.link(tovtt); tovtt.link(sink)
        src.push_buffer(fx.Buffer("cue one", pts=0, duration=1_500_000_000))
        src.push_buffer(fx.Buffer("cue two", pts=2_000_000_000, duration=1_000_000_000))
        src.end_of_stream()
        p.play_until_eos()
        vtt = "".join(str(s.buffer.data) for s in sink.samples)
        assert vtt.startswith("WEBVTT\n\n")
        assert "00:00:00.000 --> 00:00:01.500\ncue one" in vtt
        assert "00:00:02.000 --> 00:00:03.000\ncue two" in vtt

    def test_ccdetect_message(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        det = fx.element_factory_make("ccdetect")
        sink = fx.element_factory_make("fakesink")
        p = fx.Pipeline()
        for e in (src, det, sink):
            p.add(e)
        src.link(det); det.link(sink)
        src.push_buffer(fx.Buffer(pairs_to_array([cea608.PADDING]), pts=0))
        src.push_buffer(fx.Buffer(pairs_to_array(cea608.encode_roll_up("HI")), pts=1))
        src.end_of_stream()
        p.play_until_eos()
        msgs = [m for m in p.bus.messages() if m.structure and m.structure.name == "cc-detect"]
        assert len(msgs) == 1 and msgs[0].structure["cc608"] is True


class TestSccMcc:
    def _pairs_pipeline(self, enc_name, parse_name, framerate="30000/1001"):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        pairs = cea608.encode_pop_on(["SCC TEST"])
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        enc = fx.element_factory_make(enc_name)
        par = fx.element_factory_make(parse_name)
        sink = fx.element_factory_make("appsink")
        # mccparse prefers its reference-native meta/x-st-2038 output;
        # request the 608-pairs convenience path explicitly
        cf = fx.element_factory_make("capsfilter")
        cf.set_property(
            "caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        p = fx.Pipeline()
        for e in (src, enc, par, cf, sink):
            p.add(e)
        src.link(enc); enc.link(par); par.link(cf); cf.link(sink)
        pts = 3_003_000_000  # exactly 90 frames at 29.97
        src.push_buffer(fx.Buffer(pairs_to_array(pairs), pts=pts))
        src.end_of_stream()
        p.play_until_eos()
        return pairs, sink.samples

    def test_scc_roundtrip(self):
        pairs, samples = self._pairs_pipeline("sccenc", "sccparse")
        assert len(samples) == 1
        got = np.asarray(samples[0].buffer.data)
        want = np.asarray(pairs, np.uint8).reshape(-1, 2)
        assert (got == want).all()
        # timecode survives within one frame at 29.97
        assert abs(samples[0].buffer.pts - 3_003_000_000) < 34_000_000

    def test_mcc_roundtrip(self):
        pairs, samples = self._pairs_pipeline("mccenc", "mccparse")
        assert len(samples) == 1
        got = np.asarray(samples[0].buffer.data)
        want = np.asarray(pairs, np.uint8).reshape(-1, 2)
        assert (got == want).all()

    def test_mcc_alias_expansion(self):
        # aliases from mcc_parse/parser.rs:130-199
        assert mcc_decode_payload("G") == bytes([0xFA, 0x00, 0x00])
        assert mcc_decode_payload("O") == bytes([0xFA, 0x00, 0x00] * 9)
        assert mcc_decode_payload("Q") == bytes([0xFC, 0x80, 0x80])
        assert mcc_decode_payload("S") == bytes([0x96, 0x69])
        assert mcc_decode_payload("FC8080") == bytes([0xFC, 0x80, 0x80])
        data = bytes([0xFA, 0x00, 0x00] * 11 + [0x96, 0x69, 0x42])
        assert mcc_decode_payload(mcc_encode_payload(data)) == data

    def test_scc_file_format(self):
        pairs, _ = self._pairs_pipeline("sccenc", "sccparse")
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        enc = fx.element_factory_make("sccenc")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, sink):
            p.add(e)
        src.link(enc); enc.link(sink)
        src.push_buffer(fx.Buffer(pairs_to_array(pairs), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        text = "".join(str(s.buffer.data) for s in sink.samples)
        # CRLF + drop-frame timecodes (scc_enc.rs expected vectors)
        assert text.startswith("Scenarist_SCC V1.0\r\n\r\n")
        assert "00:00:00;00\t9420 9420" in text


class TestOverlay:
    def test_caption_changes_pixels(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        overlay = fx.element_factory_make("cea608overlay")
        vsrc = fx.element_factory_make("videotestsrc")
        vsrc.set_property("pattern", "white")
        vsrc.set_property("num-buffers", 2)
        ccsrc = fx.element_factory_make("appsrc")
        ccsrc.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        sink = fx.element_factory_make("appsink")
        capsf = fx.element_factory_make("capsfilter")
        capsf.set_property(
            "caps", parse_caps("video/x-raw,format=RGB,width=320,height=180,framerate=30/1")
        )
        p = fx.Pipeline()
        for e in (vsrc, capsf, ccsrc, overlay, sink):
            p.add(e)
        vsrc.link(capsf)
        capsf.pad("src").link(overlay.pad("sink"))
        ccsrc.pad("src").link(overlay.pad("cc_sink"))
        overlay.pad("src").link(sink.pad("sink"))
        ccsrc.push_buffer(fx.Buffer(pairs_to_array(cea608.encode_pop_on(["HELLO"])), pts=0))
        ccsrc.end_of_stream()
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data) for s in sink.samples]
        assert len(frames) == 2
        f = frames[-1]
        assert f.shape == (180, 320, 3)
        bottom = f[120:, :, :]
        assert (bottom < 250).any()  # caption box dims the white frame
        assert (f[:60] == 255).all()  # top untouched


class TestMccFullFraming:
    REFERENCE_LINE = "T52S524F67ZZ72F4QROO7391UC13FFF74ZZAEB4"

    def test_reference_vector_decodes(self):
        # the exact caption test vector from the reference's own parser
        # (mcc_parse/parser.rs test_caption)
        data = mcc_decode_payload(self.REFERENCE_LINE)
        assert data[:3] == bytes([0x61, 0x01, 0x52])  # ANC DID/SDID/DC
        assert data[3:5] == bytes([0x96, 0x69])  # CDP magic
        assert data[-1] == 0xB4  # stored ANC checksum byte

    def test_reference_vector_reencodes_identically(self):
        data = mcc_decode_payload(self.REFERENCE_LINE)
        assert mcc_encode_payload(data) == self.REFERENCE_LINE

    def test_anc_checksum_matches_reference_vector(self):
        from gst_plugins_rs_tpu.elements.cc.files import MccEnc

        data = mcc_decode_payload(self.REFERENCE_LINE)
        dc = data[2]
        cdp = data[3 : 3 + dc]
        wrapped = MccEnc._anc_wrap(cdp)
        assert wrapped[-1] == 0xB4  # checksum algorithm reproduces the vector

    def test_mcc_roundtrip_with_cdp(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        pairs = cea608.encode_pop_on(["CDP FRAMED"])
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        enc = fx.element_factory_make("mccenc")
        par = fx.element_factory_make("mccparse")
        dec = fx.element_factory_make("cea608tott")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, par, dec, sink):
            p.add(e)
        src.link(enc); enc.link(par); par.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(pairs_to_array(pairs), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert [str(s.buffer.data) for s in sink.samples] == ["CDP FRAMED"]

    def test_mcc_line_contains_cdp_framing(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.elements.cc.elements import pairs_to_array

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("closedcaption/x-cea-608,format=raw"))
        enc = fx.element_factory_make("mccenc")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, sink):
            p.add(e)
        src.link(enc); enc.link(sink)
        src.push_buffer(fx.Buffer(pairs_to_array([(0x94, 0x20)]), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        text = "".join(str(s.buffer.data) for s in sink.samples)
        caption_line = [l for l in text.splitlines() if "\t" in l][0]
        payload = mcc_decode_payload(caption_line.split("\t")[1])
        assert payload[:2] == bytes([0x61, 0x01])  # ANC header
        assert payload[3:5] == bytes([0x96, 0x69])  # CDP inside
