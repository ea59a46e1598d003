"""ONVIF metadata family tests: relation-meta conversion round trip, RTP
pay/depay, parse, combiner/extractor, and the box overlay."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.elements.analytics.meta import AnalyticsRelationMeta
from gst_plugins_rs_tpu.elements.analytics.onvif import (
    OnvifXMLFrameMeta,
    build_metadata_xml,
    parse_metadata_xml,
)


def sample_meta():
    m = AnalyticsRelationMeta()
    m.add_od_mtd("person", 10, 20, 30, 40, 0.9)
    m.add_od_mtd("car", 50, 60, 20, 10, 0.7)
    return m


class TestXml:
    def test_roundtrip(self):
        xml = build_metadata_xml(sample_meta(), 1_500_000_000, 640, 480)
        assert "MetadataStream" in xml and 'UtcTime="1970-01-01T00:00:01.500Z"' in xml
        back = parse_metadata_xml(xml)
        assert len(back.od) == 2
        od = back.od[0]
        assert (od.object_type, od.x, od.y, od.w, od.h) == ("person", 10, 20, 30, 40)
        assert abs(od.loc_conf_lvl - 0.9) < 1e-9

    def test_transformation_scale(self):
        xml = build_metadata_xml(None, 0, 1920, 1080)
        assert 'x="0.00104"' in xml  # 2/1920
        assert 'y="0.00185"' in xml  # 2/1080


class TestElements:
    def test_relationmeta_conversion_chain(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-raw,format=RGB,width=64,height=48,framerate=30/1"))
        to_onvif = fx.element_factory_make("relationmeta2onvifmeta")
        to_rel = fx.element_factory_make("onvifmeta2relationmeta")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, to_onvif, to_rel, sink):
            p.add(e)
        src.link(to_onvif); to_onvif.link(to_rel); to_rel.link(sink)
        buf = fx.Buffer(np.zeros((48, 64, 3), np.uint8), pts=0)
        buf.add_meta(sample_meta())
        src.push_buffer(buf)
        src.end_of_stream()
        p.play_until_eos()
        out = sink.samples[0].buffer
        assert out.get_meta(OnvifXMLFrameMeta) is not None
        rels = list(out.iter_meta(AnalyticsRelationMeta))
        # original + reconstructed
        assert len(rels) == 2
        assert [o.object_type for o in rels[-1].od] == ["person", "car"]

    def test_pay_depay_roundtrip(self):
        xml = build_metadata_xml(sample_meta(), 0, 64, 48)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-onvif-metadata"))
        pay = fx.element_factory_make("onvifmetadatapay")
        pay.set_property("mtu", 200)  # force fragmentation
        pay.set_property("ssrc", 4)
        depay = fx.element_factory_make("onvifmetadatadepay")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, pay, depay, sink):
            p.add(e)
        src.link(pay); pay.link(depay); depay.link(sink)
        src.push_buffer(fx.Buffer(xml, pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 1
        assert str(sink.samples[0].buffer.data) == xml
        s = sink.caps.structure(0)
        assert s.name == "application/x-onvif-metadata"

    def test_parse_splits_frames(self):
        xml1 = build_metadata_xml(sample_meta(), 1 * 10**9, 64, 48)
        xml2 = build_metadata_xml(None, 2 * 10**9, 64, 48)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-onvif-metadata"))
        parse = fx.element_factory_make("onvifmetadataparse")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, parse, sink):
            p.add(e)
        src.link(parse); parse.link(sink)
        src.push_buffer(fx.Buffer(xml1, pts=0))
        src.push_buffer(fx.Buffer(xml2, pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert [s.buffer.pts for s in sink.samples] == [10**9, 2 * 10**9]

    def test_combiner_extractor(self):
        """extractor splits media/meta: media passes through on src, XML
        goes out on meta_src (the reference's pad shape)."""
        comb = fx.element_factory_make("onvifmetadatacombiner")
        extract = fx.element_factory_make("onvifmetadataextractor")
        extract.set_property("remove-onvif-metadata", True)
        sink = fx.element_factory_make("appsink")
        metasink = fx.element_factory_make("appsink", "metasink")
        p = fx.Pipeline()
        vsrc = fx.element_factory_make("appsrc", "v")
        vsrc.set_property("caps", parse_caps("video/x-raw,format=RGB,width=8,height=8,framerate=30/1"))
        msrc = fx.element_factory_make("appsrc", "m")
        msrc.set_property("caps", parse_caps("application/x-onvif-metadata"))
        for e in (comb, extract, sink, metasink, msrc, vsrc):
            p.add(e)
        vsrc.pad("src").link(comb.pad("media"))
        msrc.pad("src").link(comb.pad("meta"))
        comb.pad("src").link(extract.pad("sink"))
        extract.pad("src").link(sink.pad("sink"))
        extract.pad("meta_src").link(metasink.pad("sink"))
        xml = build_metadata_xml(sample_meta(), 0, 8, 8)
        msrc.push_buffer(fx.Buffer(xml, pts=0))
        msrc.end_of_stream()
        vsrc.push_buffer(fx.Buffer(np.zeros((8, 8, 3), np.uint8), pts=0, duration=33_000_000))
        vsrc.end_of_stream()
        p.play_until_eos()
        # media untouched on src, meta stripped off it
        assert len(sink.samples) == 1
        media = sink.samples[0].buffer
        assert np.asarray(media.data).shape == (8, 8, 3)
        assert not media.metas
        # the XML frame on meta_src with the media buffer's timing
        assert len(metasink.samples) == 1
        assert str(metasink.samples[0].buffer.data) == xml
        assert metasink.samples[0].buffer.pts == 0
        assert metasink.caps.structure(0).name == "application/x-onvif-metadata"

    def test_overlay_draws_boxes(self):
        overlay = fx.element_factory_make("onvifmetadataoverlay")
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-raw,format=RGB,width=64,height=48,framerate=30/1"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, overlay, sink):
            p.add(e)
        src.link(overlay); overlay.link(sink)
        buf = fx.Buffer(np.zeros((48, 64, 3), np.uint8), pts=0)
        m = AnalyticsRelationMeta()
        m.add_od_mtd("person", 8, 8, 16, 16, 1.0)
        from gst_plugins_rs_tpu.elements.analytics.onvif import build_metadata_xml as bx

        buf.add_meta(OnvifXMLFrameMeta([bx(m, 0, 64, 48)]))
        src.push_buffer(buf)
        src.end_of_stream()
        p.play_until_eos()
        f = np.asarray(sink.samples[0].buffer.data)
        assert (f[8:10, 8:24, 1] == 255).all()  # top edge green
        assert (f[30:, :, :] == 0).all()  # below the box untouched
