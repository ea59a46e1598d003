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


class TestFeedbackWire:
    def test_generic_nack_roundtrip(self):
        nack = rtcp.GenericNack(0x11, 0x22, [100, 101, 105, 117, 400])
        (got,) = rtcp.parse_compound(nack.to_bytes())
        assert isinstance(got, rtcp.GenericNack)
        assert got.sender_ssrc == 0x11 and got.media_ssrc == 0x22
        assert sorted(got.seqnums) == [100, 101, 105, 117, 400]

    def test_twcc_roundtrip_with_losses_and_large_delta(self):
        base = 1_000_000_000
        packets = [
            (10, base),
            (11, base + 250_000),        # small delta
            (12, None),                  # lost
            (13, base + 50_000_000),     # large delta (0.05 s)
            (14, base + 40_000_000),     # negative delta
        ]
        fb = rtcp.TwccFeedback(0x33, 0x44, 5, packets)
        (got,) = rtcp.parse_compound(fb.to_bytes())
        assert isinstance(got, rtcp.TwccFeedback)
        assert got.fb_count == 5
        assert [s for s, _ in got.packets] == [10, 11, 12, 13, 14]
        assert got.packets[2][1] is None
        # arrivals reproduced to the 250 us wire resolution
        for (s, a), (_, b) in zip(packets, got.packets):
            if a is not None:
                assert abs(a - b) <= 125_000


class TestNackRtx:
    def _loss_pipeline(self, drop_seqs, rtx_pt=0):
        """rtpsend -> lossy link -> rtprecv with the RTCP path looped back."""
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        send = fx.element_factory_make("rtpsend")
        if rtx_pt:
            send.set_property("rtx-pt", rtx_pt)
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("enable-nack", True)
        recv.set_property("latency", 10**12)
        if rtx_pt:
            recv.set_property("rtx-pt-map", f"{rtx_pt}=96")
        sink = fx.element_factory_make("appsink")
        for e in (src, send, recv, sink):
            p.add(e)
        send_sink = send.request_sink_pad()
        src.pad("src").link(send_sink)
        recv_sink = recv.request_sink_pad()

        # lossy link: drops listed seqnums once (first transmission only)
        from gst_plugins_rs_tpu.core import FlowReturn, Pad, PadDirection

        dropped = set()
        link = Pad("lossy", PadDirection.SINK)

        def lossy_chain(pad, buf):
            pkt = RtpPacket.parse(np.asarray(buf.data).tobytes())
            if pkt.payload_type == 96 and pkt.sequence_number in drop_seqs \
                    and pkt.sequence_number not in dropped:
                dropped.add(pkt.sequence_number)
                return FlowReturn.OK  # swallowed
            return recv_sink.chain(buf)

        link.chain_function = lossy_chain
        link.event_function = lambda pad, ev: recv_sink.send_event(ev)
        send.pad("rtp_src_0").link(link)
        # RTCP loop: recv feedback -> send
        recv.pad("rtcp_src_0").link(send.pad("rtcp_sink_0"))
        recv.link(sink)
        return p, src, sink, dropped

    def test_recovers_via_nack_plain_resend(self):
        p, src, sink, dropped = self._loss_pipeline({2, 5})
        for b in make_rtp_buffers(8, ssrc=7, pt=96):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert dropped == {2, 5}
        seqs = sorted(
            RtpPacket.parse(np.asarray(s.buffer.data).tobytes()).sequence_number
            for s in sink.samples)
        assert seqs == list(range(8)), "lost packets must be recovered via NACK"

    def test_renacks_when_retransmission_also_lost(self):
        """If the retransmission triggered by the first NACK is itself lost,
        the seq must be re-requested after the retry deadline (the reference
        re-sends NACKs on a timer — session.rs); previously the nacked set
        suppressed it forever."""
        from gst_plugins_rs_tpu.core.parse import parse_caps
        from gst_plugins_rs_tpu.core import FlowReturn, Pad, PadDirection

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        send = fx.element_factory_make("rtpsend")
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("enable-nack", True)
        recv.set_property("latency", 10**12)
        sink = fx.element_factory_make("appsink")
        for e in (src, send, recv, sink):
            p.add(e)
        src.pad("src").link(send.request_sink_pad())
        recv_sink = recv.request_sink_pad()

        drops_left = {2: 2}  # drop seq 2 twice: original AND 1st retransmit
        link = Pad("lossy", PadDirection.SINK)

        def lossy_chain(pad, buf):
            pkt = RtpPacket.parse(np.asarray(buf.data).tobytes())
            if drops_left.get(pkt.sequence_number, 0) > 0:
                drops_left[pkt.sequence_number] -= 1
                return FlowReturn.OK
            return recv_sink.chain(buf)

        link.chain_function = lossy_chain
        link.event_function = lambda pad, ev: recv_sink.send_event(ev)
        send.pad("rtp_src_0").link(link)
        recv.pad("rtcp_src_0").link(send.pad("rtcp_sink_0"))
        recv.link(sink)
        # 16 buffers span 200 ms of pts — past the 100 ms NACK retry deadline
        for b in make_rtp_buffers(16, ssrc=7, pt=96):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert drops_left == {2: 0}
        seqs = sorted(
            RtpPacket.parse(np.asarray(s.buffer.data).tobytes()).sequence_number
            for s in sink.samples)
        assert seqs == list(range(16)), \
            "seq 2 must be recovered by the re-sent NACK"

    def test_recovers_via_nack_rtx_stream(self):
        p, src, sink, dropped = self._loss_pipeline({3}, rtx_pt=97)
        for b in make_rtp_buffers(8, ssrc=7, pt=96):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert dropped == {3}
        pkts = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes())
                for s in sink.samples]
        seqs = sorted(pkt.sequence_number for pkt in pkts)
        assert seqs == list(range(8))
        # the repaired packet was reconstructed back to the media pt/ssrc
        repaired = next(pkt for pkt in pkts if pkt.sequence_number == 3)
        assert repaired.payload_type == 96 and repaired.ssrc == 7
        assert repaired.payload == b"x" * 100


class TestClockDrivenRtcp:
    def test_stalled_sender_still_emits_sr(self):
        """RFC 3550 §6.3: RTCP is timer-scheduled (0.5x-1.5x interval
        randomization), not media-driven — a sender that stops pushing
        media for 2x the interval must still emit SR/RR on time
        (reference: rtpbin2/session.rs RTCP scheduling)."""
        from gst_plugins_rs_tpu.core import SECOND, State, TestClock
        from gst_plugins_rs_tpu.core.parse import parse_caps

        from gst_plugins_rs_tpu.core import Event, Segment

        p = fx.Pipeline()
        send = fx.element_factory_make("rtpsend")
        send.set_property("rtcp-interval", SECOND)
        rtp_sink = fx.element_factory_make("appsink")
        rtcp_sink = fx.element_factory_make("appsink")
        for e in (send, rtp_sink, rtcp_sink):
            p.add(e)
        sinkpad = send.request_sink_pad()
        send.link(rtp_sink)
        send.pad("rtcp_src_0").link(
            next(pp for pp in rtcp_sink.sink_pads()))
        tc = TestClock()
        p.use_clock(tc)
        p.set_state(State.PLAYING)
        try:
            sinkpad.send_event(Event.new_stream_start("s"))
            sinkpad.send_event(Event.new_caps(parse_caps("application/x-rtp")))
            sinkpad.send_event(Event.new_segment(Segment()))
            # one media packet establishes the stream, then upstream stalls
            for b in make_rtp_buffers(1, ssrc=7, pt=96):
                sinkpad.chain(b)
            n0 = len(rtcp_sink.samples)
            tc.advance(2 * SECOND)  # max randomized interval is 1.5x
            assert len(rtcp_sink.samples) > n0, \
                "stalled sender must still emit RTCP on the clock"
            data = np.asarray(rtcp_sink.samples[-1].buffer.data).tobytes()
            kinds = [type(x).__name__ for x in rtcp.parse_compound(data)]
            assert "SenderReport" in kinds
            # keeps reporting every interval while stalled
            n1 = len(rtcp_sink.samples)
            tc.advance(2 * SECOND)
            assert len(rtcp_sink.samples) > n1
        finally:
            p.set_state(State.NULL)

    def test_stalled_receiver_still_emits_rr(self):
        from gst_plugins_rs_tpu.core import SECOND, State, TestClock
        from gst_plugins_rs_tpu.core.parse import parse_caps

        from gst_plugins_rs_tpu.core import Event, Segment

        p = fx.Pipeline()
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtcp-interval", SECOND)
        media_sink = fx.element_factory_make("appsink")
        rtcp_sink = fx.element_factory_make("appsink")
        for e in (recv, media_sink, rtcp_sink):
            p.add(e)
        sinkpad = recv.request_sink_pad()
        recv.pad("rtcp_src_0").link(
            next(pp for pp in rtcp_sink.sink_pads()))
        recv.link(media_sink)
        tc = TestClock()
        p.use_clock(tc)
        p.set_state(State.PLAYING)
        try:
            sinkpad.send_event(Event.new_stream_start("s"))
            sinkpad.send_event(Event.new_caps(parse_caps("application/x-rtp")))
            sinkpad.send_event(Event.new_segment(Segment()))
            for b in make_rtp_buffers(2, ssrc=9, pt=96):
                sinkpad.chain(b)
            n0 = len(rtcp_sink.samples)
            tc.advance(2 * SECOND)
            assert len(rtcp_sink.samples) > n0, \
                "stalled receiver must still emit RRs on the clock"
            data = np.asarray(rtcp_sink.samples[-1].buffer.data).tobytes()
            kinds = [type(x).__name__ for x in rtcp.parse_compound(data)]
            assert "ReceiverReport" in kinds
        finally:
            p.set_state(State.NULL)


class TestTwccEndToEnd:
    def test_feedback_drives_gccbwe(self):
        """app -> rtpgccbwe -> rtpsend (stamps TWCC ext) -> rtprecv
        (generates TWCC feedback) -> rtcp loop -> rtpsend correlates and
        feeds the estimator upstream (gcc/imp.rs model)."""
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        bwe = fx.element_factory_make("rtpgccbwe")
        send = fx.element_factory_make("rtpsend")
        send.set_property("twcc-ext-id", 5)
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("twcc-ext-id", 5)
        recv.set_property("twcc-feedback-count", 4)
        sink = fx.element_factory_make("appsink")
        for e in (src, bwe, send, recv, sink):
            p.add(e)
        src.link(bwe)
        bwe.pad("src").link(send.request_sink_pad())
        send.pad("rtp_src_0").link(recv.request_sink_pad())
        recv.pad("rtcp_src_0").link(send.pad("rtcp_sink_0"))
        recv.link(sink)
        fed = []
        orig = bwe.push_feedback
        bwe.push_feedback = lambda pkts: (fed.append(pkts), orig(pkts))[1]
        for b in make_rtp_buffers(12, ssrc=9, pt=96):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert fed, "TWCC feedback never reached the estimator"
        flat = [t for pkts in fed for t in pkts]
        assert all(len(t) == 4 for t in flat)
        seqs = [t[0] for t in flat]
        assert seqs == sorted(seqs)
        # receiver still got all packets (extension did not break parsing)
        assert len(sink.samples) == 12


class TestTwccWraparound:
    def test_feedback_window_across_seq_wrap(self):
        """A TWCC feedback window straddling 65535->0 must unwrap, not span
        65536 entries (review finding: struct.error / phantom losses)."""
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("twcc-ext-id", 5)
        recv.set_property("twcc-feedback-count", 4)
        sink = fx.element_factory_make("appsink")
        fb_sink = fx.element_factory_make("appsink", "fb")
        for e in (src, recv, sink, fb_sink):
            p.add(e)
        src.pad("src").link(recv.request_sink_pad())
        recv.pad("rtcp_src_0").link(fb_sink.pad("sink"))
        recv.link(sink)
        from gst_plugins_rs_tpu.net.rtp import build_onebyte_extensions

        for i, twcc_seq in enumerate([65534, 65535, 0, 1]):
            pkt = RtpPacket(96, i, i * 100, 7, b"x" * 20,
                            extension=build_onebyte_extensions(
                                {5: twcc_seq.to_bytes(2, "big")}))
            src.push_buffer(fx.Buffer(
                np.frombuffer(pkt.to_bytes(), np.uint8),
                pts=i * 10_000_000))
        src.end_of_stream()
        p.play_until_eos()
        fbs = [x for s in fb_sink.samples
               for x in rtcp.parse_compound(np.asarray(s.buffer.data).tobytes())
               if isinstance(x, rtcp.TwccFeedback)]
        assert fbs, "no TWCC feedback emitted"
        fb = fbs[-1]
        assert len(fb.packets) == 4  # unwrapped: no phantom entries
        assert [s for s, _ in fb.packets] == [65534, 65535, 0, 1]
        assert all(a is not None for _, a in fb.packets)


class TestRtp2Session:
    """GstRtp2Session surface + session hardening (VERDICT r3 #8 /
    reference net/rtp/src/rtpbin2/session.rs): SSRC collision forces
    re-SSRC, BYE tears down the jitterbuffer with reason propagation,
    SDES CNAME visible in stats, pt-map/clock-map/sdes/stats object
    properties, new-ssrc signal."""

    def _pair(self, rtp_id):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        p = fx.Pipeline()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        send = fx.element_factory_make("rtpsend")
        send.set_property("rtp-id", rtp_id)
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtp-id", rtp_id)
        media = fx.element_factory_make("appsink", "media")
        rtcp_out = fx.element_factory_make("appsink", "sendrtcp")
        for e in (src, send, recv, media, rtcp_out):
            p.add(e)
        src.pad("src").link(send.request_sink_pad())
        send.pad("rtp_src_0").link(recv.request_sink_pad())
        send.pad("rtcp_src_0").link(rtcp_out.pad("sink"))
        recv.link(media)
        return p, src, send, recv, media, rtcp_out

    def test_loopback_is_not_a_collision(self):
        """Our own packets arriving at the paired recv half are a loop
        (RFC 3550 §8.2 same-transport-address case), not a collision."""
        p, src, send, recv, media, rtcp_out = self._pair("loop-ok")
        for b in make_rtp_buffers(6, ssrc=0x11):
            src.push_buffer(b)
        src.end_of_stream()
        p.play_until_eos()
        assert len(media.samples) == 6
        byes = [x for s in rtcp_out.samples
                for x in rtcp.parse_compound(np.asarray(s.buffer.data).tobytes())
                if isinstance(x, rtcp.Bye)]
        assert not byes

    def test_ssrc_collision_forces_re_ssrc(self):
        """A remote packet under one of our send SSRCs (same seq, different
        bytes) forces BYE on the old identity and a rewrite of subsequent
        outgoing packets to a fresh SSRC."""
        send = fx.element_factory_make("rtpsend")
        send.set_property("rtp-id", "collide")
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtp-id", "collide")
        media = fx.element_factory_make("appsink", "media")
        rtcp_out = fx.element_factory_make("appsink", "sendrtcp")
        spad = send.request_sink_pad()
        send.pad("rtp_src_0").link(recv.request_sink_pad())
        send.pad("rtcp_src_0").link(rtcp_out.pad("sink"))
        recv.link(media)
        bufs = make_rtp_buffers(2, ssrc=0x22, payload=b"ours" * 25)
        spad.chain(bufs[0])
        # remote impostor: same ssrc + seq as our in-history packet, but
        # different payload bytes -> genuine third-party collision
        impostor = RtpPacket(96, 0, 999, 0x22, b"them" * 25)
        recv.pad("rtp_sink_0").chain(
            fx.Buffer(np.frombuffer(impostor.to_bytes(), np.uint8), pts=0))
        spad.chain(bufs[1])
        byes = [x for s in rtcp_out.samples
                for x in rtcp.parse_compound(np.asarray(s.buffer.data).tobytes())
                if isinstance(x, rtcp.Bye)]
        assert byes and byes[0].ssrcs == [0x22]
        assert byes[0].reason == "ssrc collision detected"
        # the second outgoing packet no longer uses the collided ssrc:
        # recv demuxed it onto a fresh ssrc stream, and the send half's
        # stats moved to the new identity
        assert 0x22 in recv._streams
        new_ssrcs = [s for s in recv._streams if s != 0x22]
        assert len(new_ssrcs) == 1
        assert 0x22 not in send._streams
        assert send.get_property("stats").fields.get(f"ssrc-{new_ssrcs[0]}")

    def test_bye_tears_down_stream_with_reason(self):
        p, src, send, recv, media, rtcp_out = self._pair("bye-reason")
        seen = []
        session = recv.emit("get-session", 0)
        session.connect("bye-ssrc", lambda ssrc, reason: seen.append(
            (ssrc, reason)))
        for b in make_rtp_buffers(3, ssrc=0x33):
            src.push_buffer(b)
        bye = rtcp.Bye([0x33], "shutting down")
        recv.pad("rtcp_sink_0").chain(
            fx.Buffer(np.frombuffer(bye.to_bytes(), np.uint8), pts=0))
        assert seen == [(0x33, "shutting down")]
        assert 0x33 not in recv._streams  # jitterbuffer torn down
        src.end_of_stream()
        p.play_until_eos()
        assert len(media.samples) == 3

    def test_sdes_cname_visible_in_stats(self):
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtp-id", "sdes-stats")
        rpad = recv.request_sink_pad()
        sink = fx.element_factory_make("appsink")
        recv.link(sink)
        for b in make_rtp_buffers(2, ssrc=0x44):
            rpad.chain(b)
        sdes = rtcp.Sdes(0x44, "remote@example")
        recv.pad("rtcp_sink_0").chain(
            fx.Buffer(np.frombuffer(sdes.to_bytes(), np.uint8), pts=0))
        stats = recv.get_property("stats")
        assert stats.fields["ssrc-68"]["cname"] == "remote@example"

    def test_session_object_properties(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        send = fx.element_factory_make("rtpsend")
        send.set_property("rtp-id", "sess-props")
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("rtp-id", "sess-props")
        media = fx.element_factory_make("appsink")
        spad = send.request_sink_pad()
        send.pad("rtp_src_0").link(recv.request_sink_pad())
        recv.link(media)
        session = send.emit("get-session", 0)
        news = []
        session.connect("new-ssrc", news.append)
        caps = parse_caps("application/x-rtp,encoding-name=OPUS,clock-rate=48000")
        session.set_property("pt-map", {96: caps})
        session.set_property("sdes", {"cname": "me@host", "tool": "fx"})
        session.set_property("clock-map", {"ptp=IEEE1588:00-11": "clock-a"})
        assert send.get_property("cname") == "me@host"
        for b in make_rtp_buffers(2, ssrc=0x55):
            spad.chain(b)
        assert news == [0x55]
        # pt-map drove the stream pad caps (caps land on the sink side)
        assert media.pad("sink").current_caps.structure(0)[
            "encoding-name"] == "OPUS"
        assert session.get_property("pt-map").fields["96"] is caps
        assert session.get_property("sdes")["cname"] == "me@host"
        assert session.get_property("sdes")["tool"] == "fx"
        assert session.get_property("clock-map").fields[
            "ptp=IEEE1588:00-11"] == "clock-a"
        stats = session.get_property("stats")
        assert "send" in stats.fields and "recv" in stats.fields
