"""Round-3 closedcaption surface behaviors: origin positioning (indent
PAC + tab offsets), speaker-change prefixes, roll-up-timeout erasure,
extended 708 service numbers, sccenc padding control, mccenc header
fields, jsontovtt line attribute."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import Harness
from gst_plugins_rs_tpu.core.events import Event, EventType
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.ops import cea608


def _pairs(buf):
    return [tuple(p) for p in np.asarray(buf.data, np.uint8).reshape(-1, 2)]


def _tt(harness_props=None):
    el = fx.element_factory_make("tttocea608")
    for k, v in (harness_props or {}).items():
        el.set_property(k, v)
    h = Harness(el)
    h.set_src_caps(parse_caps("text/x-raw,format=utf8"))
    return el, h


class TestTtToCea608Surface:
    def test_origin_column_emits_indent_pac_and_tab_offset(self):
        el, h = _tt({"origin-column": 6, "mode": "roll-up2"})
        h.push(fx.Buffer("HI", pts=0))
        out = _pairs(h.pull())
        # indent PAC for row 14, indent 4 => base (0x14,0x40)+0x10+2
        want_pac = (cea608.with_parity(0x14), cea608.with_parity(0x52))
        assert want_pac in out
        # plus a tab offset of 2
        assert (cea608.with_parity(0x17), cea608.with_parity(0x22)) in out
        # decoder still reads the text back on row 14
        dec = cea608.Cea608Decoder()
        for hi, lo in out:
            dec.push_pair(hi, lo)
        dec.flush()
        caps = [e for e in dec.take_events() if e is not None]
        assert caps and caps[0].lines == ["HI"]

    def test_speaker_change_event_prefixes_next_line(self):
        el, h = _tt({"speaker-prefix": ">> "})
        h.push_event(Event(EventType.CUSTOM_DOWNSTREAM,
                           name="rstranscribe/speaker-change"))
        h.push(fx.Buffer("HELLO", pts=0))
        out = _pairs(h.pull())
        dec = cea608.Cea608Decoder()
        for hi, lo in out:
            dec.push_pair(hi, lo)
        dec.flush()
        caps = [e for e in dec.take_events() if e is not None]
        assert caps[0].lines == [">> HELLO"]

    def test_roll_up_timeout_erases_display(self):
        el, h = _tt({"roll-up-timeout": 1_000_000_000})
        h.push(fx.Buffer("A", pts=0))
        h.pull()
        h.push(fx.Buffer("B", pts=5_000_000_000))  # 5s later > 1s timeout
        out = _pairs(h.pull())
        edm = cea608.control_pair(cea608.EDM)
        assert out[0] == edm  # display erased before the new text


class TestTtToCea708Surface:
    def test_service_number_and_608_compat(self):
        el = fx.element_factory_make("tttocea708")
        el.set_property("service-number", 42)
        el.set_property("cea608-channel", 1)
        h = Harness(el)
        h.set_src_caps(parse_caps("text/x-raw,format=utf8"))
        h.push(fx.Buffer("HEY", pts=0))
        data = np.asarray(h.pull().data, np.uint8).tobytes()
        from gst_plugins_rs_tpu.ops import cea708

        trips = cea708.parse_cc_data(data)
        # 608 compat triplets present (cc_type 0)
        assert any(v and t == 0 for v, t, _, _ in trips)
        decoders = cea708.decode_dtvcc(trips)
        assert 42 in decoders


class TestFilesSurface:
    def test_sccenc_output_padding_false_strips_padding(self):
        el = fx.element_factory_make("sccenc")
        el.set_property("output-padding", False)
        h = Harness(el)
        h.set_src_caps(parse_caps("closedcaption/x-cea-608,format=raw"))
        pairs = np.asarray([[0x80, 0x80], [0xC1, 0xC2], [0x80, 0x80]], np.uint8)
        h.push(fx.Buffer(pairs, pts=0))
        h.push_eos()  # lines flush lazily (consecutive-frame merging)
        text = str(h.pull().data)
        assert "8080" not in text and "c1c2" in text

    def test_mccenc_uuid_and_creation_date_in_header(self):
        el = fx.element_factory_make("mccenc")
        el.set_property("uuid", "DEADBEEF-0000-0000-0000-000000000000")
        el.set_property("creation-date", "Mon, Jan 05, 2026 10:00:00")
        h = Harness(el)
        h.set_src_caps(parse_caps("closedcaption/x-cea-608,format=raw"))
        h.push(fx.Buffer(np.asarray([[0xC1, 0xC2]], np.uint8), pts=0))
        text = str(h.pull().data)
        assert "UUID=DEADBEEF-0000-0000-0000-000000000000" in text
        assert "Creation Date=Mon, Jan 05, 2026 10:00:00" in text


class TestJsonToVtt:
    def test_line_attribute_from_rows(self):
        el = fx.element_factory_make("jsontovtt")
        el.set_property("set-line-attribute", True)
        h = Harness(el)
        h.set_src_caps(parse_caps("application/x-json"))
        rec = '{"lines": [{"text": "X", "row": 12}, {"text": "Y", "row": 13}]}'
        h.push(fx.Buffer(rec, pts=0, duration=1_000_000_000))
        cue = str(h.pull().data)
        assert " line:12\n" in cue
