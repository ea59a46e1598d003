"""mpegtsmux and debugseimetainserter tests."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.mux import mpegts


class TestMpegTsMux:
    def test_mux_klv_stream_structure(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-klv,parsed=true"))
        mux = fx.element_factory_make("mpegtsmux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, mux, sink):
            p.add(e)
        src.pad("src").link(mux.request_sink_pad())
        mux.pad("src").link(sink.pad("sink"))
        payloads = [bytes([i]) * 150 for i in range(3)]
        for i, pl in enumerate(payloads):
            src.push_buffer(fx.Buffer(np.frombuffer(pl, np.uint8), pts=i * 10**9))
        src.end_of_stream()
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert len(data) % 188 == 0
        pkts = list(mpegts.iter_packets(data))
        pids = {p.pid for p in pkts}
        assert 0 in pids and 0x100 in pids and 0x101 in pids
        # PCR present on the elementary pid
        assert any(p.pcr is not None for p in pkts)
        # reassemble PES payloads and recover the KLV units
        es = b"".join(p.payload for p in pkts if p.pid == 0x101 and p.payload)
        for pl in payloads:
            assert pl in es
        assert sink.caps.structure(0).name == "video/mpegts"

    def test_mux_feeds_rtp_and_livesrc_layers(self):
        """mpegtsmux output survives rtpmp2tpay2/depay2 carriage."""
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-klv,parsed=true"))
        mux = fx.element_factory_make("mpegtsmux")
        pay = fx.element_factory_make("rtpmp2tpay2")
        pay.set_property("ssrc", 1)
        depay = fx.element_factory_make("rtpmp2tdepay2")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, mux, pay, depay, sink):
            p.add(e)
        src.pad("src").link(mux.request_sink_pad())
        mux.pad("src").link(pay.pad("sink"))
        pay.link(depay); depay.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(bytes(1500), np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert len(data) % 188 == 0 and len(data) > 0
        assert all(pkt.pid in (0, 0x100, 0x101) for pkt in mpegts.iter_packets(data))

    def test_two_streams_pmt(self):
        mux = fx.element_factory_make("mpegtsmux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(mux); p.add(sink)
        mux.pad("src").link(sink.pad("sink"))
        srcs = []
        for caps in ("audio/mpeg,mpegversion=4,rate=48000",
                     "video/x-h264,stream-format=avc"):
            s = fx.element_factory_make("appsrc")
            s.set_property("caps", parse_caps(caps))
            p.add(s)
            s.pad("src").link(mux.request_sink_pad())
            srcs.append(s)
        for i, s in enumerate(srcs):
            s.push_buffer(fx.Buffer(np.frombuffer(bytes(100), np.uint8), pts=i * 10**7))
            s.end_of_stream()
        p.play_until_eos()
        data = b"".join(np.asarray(x.buffer.data).tobytes() for x in sink.samples)
        pids = {pkt.pid for pkt in mpegts.iter_packets(data)}
        assert {0, 0x100, 0x101, 0x102} <= pids


class TestDebugSei:
    def test_insert_and_parse(self):
        from gst_plugins_rs_tpu.elements.generic.debugsei import parse_sei_nals

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-h264,stream-format=avc"))
        ins = fx.element_factory_make("debugseimetainserter")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, ins, sink):
            p.add(e)
        src.link(ins); ins.link(sink)
        nal = (5).to_bytes(4, "big") + bytes([0x65, 1, 2, 3, 4])  # fake IDR
        src.push_buffer(fx.Buffer(np.frombuffer(nal, np.uint8), pts=42_000_000))
        src.end_of_stream()
        p.play_until_eos()
        au = np.asarray(sink.samples[0].buffer.data).tobytes()
        seis = list(parse_sei_nals(au))
        assert len(seis) == 1
        uuid, payload = seis[0]
        assert payload == b"pts=42000000"
        assert au.endswith(nal)  # original AU intact after the SEI

    def test_large_payload_size_coding(self):
        from gst_plugins_rs_tpu.elements.generic.debugsei import (
            build_sei_nal,
            parse_sei_nals,
        )

        body = bytes(300)
        sei = build_sei_nal(bytes(16), body)
        (uuid, payload), = parse_sei_nals(sei)
        assert payload == body  # 255-escape size coding round-trips


def test_tsmux_delta_flags_for_segmenters():
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("meta/x-klv,parsed=true"))
    mux = fx.element_factory_make("mpegtsmux")
    mux.set_property("pat-interval", 8)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, mux, sink):
        p.add(e)
    src.pad("src").link(mux.request_sink_pad())
    mux.pad("src").link(sink.pad("sink"))
    for i in range(6):
        src.push_buffer(fx.Buffer(np.frombuffer(bytes(150), np.uint8), pts=i * 10**8))
    src.end_of_stream()
    p.play_until_eos()
    flags = [s.buffer.has_flag(fx.BufferFlags.DELTA_UNIT) for s in sink.samples]
    assert flags[0] is False  # first carries PAT/PMT
    assert any(flags)  # intermediate buffers are delta until the next PAT
