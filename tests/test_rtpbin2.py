"""rtpsend / rtprecv / ts-jitterbuffer tests.

Mirrors the reference rtpbin2 tests (net/rtp/tests/rtpbin2.rs): in-process
send/recv pipelines, RTCP report content checks, and jitterbuffer
reordering semantics.
"""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.net import rtcp
from gst_plugins_rs_tpu.net.jitterbuffer import JitterBuffer
from gst_plugins_rs_tpu.net.rtp import RtpPacket


def make_rtp_buffers(n, ssrc=7, pt=96, payload=b"x" * 100, seq0=0, rate=8000):
    bufs = []
    for i in range(n):
        pkt = RtpPacket(pt, (seq0 + i) & 0xFFFF, i * 100, ssrc, payload)
        bufs.append(
            fx.Buffer(np.frombuffer(pkt.to_bytes(), np.uint8),
                      pts=i * 12_500_000, duration=12_500_000)
        )
    return bufs


class TestJitterBuffer:
    def test_in_order_passthrough(self):
        jb = JitterBuffer(0)
        out = []
        for i in range(5):
            out += jb.insert(i, f"p{i}", pts=i * 10)
        assert out == [f"p{i}" for i in range(5)]

    def test_reorders_within_latency(self):
        jb = JitterBuffer(100)
        assert jb.insert(0, "a", pts=0) == ["a"]
        assert jb.insert(2, "c", pts=20) == []  # held: gap, not expired
        assert jb.insert(1, "b", pts=10) == ["b", "c"]

    def test_gap_flush_after_latency(self):
        jb = JitterBuffer(50)
        jb.insert(0, "a", pts=0)
        assert jb.insert(2, "c", pts=20) == []
        # no seq 1 ever arrives; a much later packet expires the deadline
        out = jb.insert(3, "d", pts=100)
        assert out == ["c", "d"]
        assert jb.num_lost == 1

    def test_late_packet_dropped(self):
        jb = JitterBuffer(0)
        jb.insert(0, "a")
        jb.insert(1, "b")
        jb.insert(0, "dup")  # already forwarded
        assert jb.num_late_dropped == 1

    def test_flush_in_order(self):
        jb = JitterBuffer(10**12)
        assert jb.insert(0, "a", pts=0) == ["a"]  # first packet: in order
        jb.insert(3, "d", pts=1)
        jb.insert(2, "c", pts=2)
        assert jb.flush() == ["c", "d"]  # drained in seqnum order

    def test_seqnum_wraparound(self):
        jb = JitterBuffer(0)
        out = []
        for i in range(65530, 65541):  # crosses 65535 -> 0
            out += jb.insert(i & 0xFFFF, i)
        assert out == list(range(65530, 65541))


class TestTsJitterBufferElement:
    def test_reorder_element(self):
        src = fx.element_factory_make("appsrc")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src.set_property("caps", parse_caps("application/x-rtp"))
        jb = fx.element_factory_make("ts-jitterbuffer")
        jb.set_property("latency", 10**12)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, jb, sink):
            p.add(e)
        src.link(jb); jb.link(sink)
        bufs = make_rtp_buffers(4)
        for b in (bufs[0], bufs[2], bufs[1], bufs[3]):  # swap middle two
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        seqs = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes()).sequence_number
                for s in sink.samples]
        assert seqs == [0, 1, 2, 3]


class TestRtpSend:
    def test_forward_and_sr(self):
        p = fx.Pipeline()
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        send = fx.element_factory_make("rtpsend")
        send.set_property("rtcp-interval", 25_000_000)  # every 2 packets at 12.5ms
        rtp_sink = fx.element_factory_make("appsink", "rtpout")
        rtcp_sink = fx.element_factory_make("appsink", "rtcpout")
        for e in (src, send, rtp_sink, rtcp_sink):
            p.add(e)
        sinkpad = send.request_sink_pad()
        src.pad("src").link(sinkpad)
        send.pad("rtp_src_0").link(rtp_sink.pad("sink"))
        send.pad("rtcp_src_0").link(rtcp_sink.pad("sink"))
        for b in make_rtp_buffers(6, ssrc=0xABCD):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert len(rtp_sink.samples) == 6  # RTP passthrough
        assert len(rtcp_sink.samples) >= 2
        pkts = rtcp.parse_compound(
            np.asarray(rtcp_sink.samples[-1].buffer.data).tobytes()
        )
        sr = next(x for x in pkts if isinstance(x, rtcp.SenderReport))
        sdes = next(x for x in pkts if isinstance(x, rtcp.Sdes))
        assert sr.ssrc == 0xABCD
        assert sr.packet_count in (5, 6)
        assert sr.octet_count == sr.packet_count * 100
        assert sdes.cname  # element name by default


class TestRtpRecv:
    def _recv_pipeline(self, latency=0):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("latency", latency)
        sink = fx.element_factory_make("appsink")
        for e in (src, recv, sink):
            p.add(e)
        src.pad("src").link(recv.request_sink_pad())
        recv.link(sink)  # deferred: links the first ssrc pad
        return p, src, recv, sink

    def test_ssrc_pad_naming_and_flow(self):
        p, src, recv, sink = self._recv_pipeline()
        for b in make_rtp_buffers(4, ssrc=0x1234, pt=96):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 4
        assert "rtp_src_0_4660_96" in recv.pads  # 0x1234 = 4660

    def test_jitterbuffer_reorder_in_recv(self):
        p, src, recv, sink = self._recv_pipeline(latency=10**12)
        bufs = make_rtp_buffers(4, ssrc=5)
        for b in (bufs[0], bufs[2], bufs[1], bufs[3]):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        seqs = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes()).sequence_number
                for s in sink.samples]
        assert seqs == [0, 1, 2, 3]

    def test_rr_generation(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtcp-interval", 25_000_000)
        sink = fx.element_factory_make("appsink")
        rtcp_sink = fx.element_factory_make("appsink", "rr")
        for e in (src, recv, sink, rtcp_sink):
            p.add(e)
        src.pad("src").link(recv.request_sink_pad())
        recv.pad("rtcp_src_0").link(rtcp_sink.pad("sink"))
        recv.link(sink)
        for b in make_rtp_buffers(6, ssrc=99):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert rtcp_sink.samples
        pkts = rtcp.parse_compound(np.asarray(rtcp_sink.samples[-1].buffer.data).tobytes())
        rr = next(x for x in pkts if isinstance(x, rtcp.ReceiverReport))
        assert rr.reports[0].ssrc == 99
        assert rr.reports[0].cumulative_lost == 0


class TestRtcpBytes:
    def test_sr_roundtrip(self):
        sr = rtcp.SenderReport(1, rtcp.ntp_from_ns(1_700_000_000_123_456_789),
                               1234, 10, 1000,
                               [rtcp.ReportBlock(2, 10, 5, 100, 7, 42, 17)])
        (got,) = rtcp.parse_compound(sr.to_bytes())
        assert got == sr

    def test_compound_sr_sdes_bye(self):
        data = (
            rtcp.SenderReport(1, 0, 0, 0, 0).to_bytes()
            + rtcp.Sdes(1, "host@example").to_bytes()
            + rtcp.Bye([1], "shutting down").to_bytes()
        )
        pkts = rtcp.parse_compound(data)
        assert [type(x) for x in pkts] == [rtcp.SenderReport, rtcp.Sdes, rtcp.Bye]
        assert pkts[1].cname == "host@example"
        assert pkts[2].reason == "shutting down"
        assert len(data) % 4 == 0

    def test_negative_cumulative_lost(self):
        rb = rtcp.ReportBlock(1, 0, -3, 0, 0, 0, 0)
        got = rtcp.ReportBlock.parse(rb.to_bytes())
        assert got.cumulative_lost == -3


class TestEndToEnd:
    def test_send_recv_full_chain(self):
        """audio -> alawenc -> pay -> rtpsend -> rtprecv(jb) -> depay -> alawdec."""
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.parse_launch(
            "audiotestsrc wave=ticks num-buffers=6 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! rtppcmapay2 ssrc=11 seqnum-offset=0 timestamp-offset=0 "
            "! rtpsend name=send"
        )
        send = p.by_name("send")
        recv = fx.element_factory_make("rtprecv")
        depay = fx.element_factory_make("rtppcmadepay2")
        dec = fx.element_factory_make("alawdec")
        sink = fx.element_factory_make("appsink")
        for e in (recv, depay, dec, sink):
            p.add(e)
        send.pad("rtp_src_0").link(recv.request_sink_pad())
        recv.link(depay)
        depay.link(dec); dec.link(sink)
        p.play_until_eos()
        out = sink.concat_audio()
        assert out.shape == (4800, 1)
        assert np.abs(out.astype(np.int32)).max() > 1000
