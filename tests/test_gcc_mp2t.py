"""GCC bandwidth estimation and MPEG-TS carriage tests."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.mux import mpegts
from gst_plugins_rs_tpu.net.gcc import GoogCC, PacketFeedback
from gst_plugins_rs_tpu.net.rtp import RtpPacket

MS = 1_000_000


def feedback(cc, packets):
    return cc.process_feedback([PacketFeedback(*p) for p in packets])


def run_steady(cc, n_reports, delay_growth_ns=0, start=0, loss_every=0):
    """Simulate n_reports of 10 packets at 5 Mbps; queue delay optionally
    grows per packet."""
    est = cc.aimd.bitrate
    seq = 0
    t = start
    delay = 10 * MS
    for _ in range(n_reports):
        pkts = []
        for _ in range(10):
            seq += 1
            t += 2 * MS  # 500 pkt/s
            delay += delay_growth_ns
            lost = loss_every and (seq % loss_every == 0)
            pkts.append((seq, t, None if lost else t + delay, 1250))
        est = feedback(cc, pkts)
    return est


class TestGcc:
    def test_stable_network_increases(self):
        cc = GoogCC(start_bitrate=1_000_000)
        est = run_steady(cc, 30)
        assert est > 1_000_000

    def test_queue_buildup_decreases(self):
        cc = GoogCC(start_bitrate=5_000_000)
        # steady warm-up then delay growing 1 ms per packet -> overuse
        run_steady(cc, 5)
        est = run_steady(cc, 30, delay_growth_ns=1 * MS, start=10_000 * MS)
        assert est < 5_000_000
        assert cc.last_state == "overuse"

    def test_heavy_loss_decreases(self):
        cc = GoogCC(start_bitrate=5_000_000)
        est = run_steady(cc, 20, loss_every=4)  # 25% loss
        assert est < 5_000_000

    def test_bounds_respected(self):
        cc = GoogCC(start_bitrate=200_000, min_bitrate=100_000, max_bitrate=300_000)
        est = run_steady(cc, 100)
        assert est <= 300_000
        cc2 = GoogCC(start_bitrate=150_000, min_bitrate=100_000, max_bitrate=300_000)
        est2 = run_steady(cc2, 50, delay_growth_ns=2 * MS)
        assert est2 >= 100_000


class TestGccElement:
    def test_estimate_property_and_message(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        bwe = fx.element_factory_make("rtpgccbwe")
        bwe.set_property("estimated-bitrate", 1_000_000)
        sink = fx.element_factory_make("fakesink")
        p = fx.Pipeline()
        for e in (src, bwe, sink):
            p.add(e)
        src.link(bwe); bwe.link(sink)
        p.set_state(fx.State.PLAYING)
        pkts = []
        t = 0
        for seq in range(50):
            t += 2 * MS
            pkts.append((seq, t, t + 10 * MS, 1250))
        est = bwe.push_feedback(pkts)
        assert est == bwe.get_property("estimated-bitrate")
        msgs = [m for m in p.bus.messages()
                if m.structure and m.structure.name == "rtpgccbwe-estimate"]
        assert msgs and msgs[-1].structure["bitrate"] == est
        p.set_state(fx.State.NULL)


def make_ts_stream(n_pes=3):
    out = [mpegts.build_pat(), mpegts.build_pmt([(0x06, 0x101)])]
    cc = 0
    for i in range(n_pes):
        pes = mpegts.build_pes(0xBD, bytes([i]) * 300, pts_90k=i * 9000)
        pkts = mpegts.packetize_pes(0x101, pes, continuity_start=cc)
        cc = (cc + len(pkts)) & 0xF
        out += pkts
    return b"".join(out)


class TestMpegTs:
    def test_packet_roundtrip_with_pcr(self):
        pkt = mpegts.build_packet(0x101, b"payload", pusi=True, pcr=27_000_000 * 2)
        parsed = mpegts.TsPacket.parse(pkt)
        assert parsed.pid == 0x101
        assert parsed.payload_unit_start
        assert parsed.pcr == 27_000_000 * 2
        assert mpegts.pcr_to_ns(parsed.pcr) == 2_000_000_000
        assert parsed.payload == b"payload"

    def test_stream_structure(self):
        data = make_ts_stream()
        pids = [p.pid for p in mpegts.iter_packets(data)]
        assert pids[0] == 0 and pids[1] == 0x100
        assert all(p == 0x101 for p in pids[2:])

    def test_rtp_carriage_roundtrip(self):
        data = make_ts_stream(4)
        assert len(data) % 188 == 0
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/mpegts,systemstream=true,packetsize=188"))
        pay = fx.element_factory_make("rtpmp2tpay2")
        pay.set_property("ssrc", 1)
        pay.set_property("seqnum-offset", 0)
        pay.set_property("timestamp-offset", 0)
        depay = fx.element_factory_make("rtpmp2tdepay2")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, pay, depay, sink):
            p.add(e)
        src.link(pay); pay.link(depay); depay.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(data, np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        got = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert got == data
        assert sink.caps.structure(0).name == "video/mpegts"

    def test_pay_static_pt33_and_1316(self):
        data = b"".join(mpegts.build_packet(0x101, bytes([i])) for i in range(14))
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/mpegts,systemstream=true,packetsize=188"))
        pay = fx.element_factory_make("rtpmp2tpay2")
        pay.set_property("ssrc", 1)
        pay.set_property("mtu", 1400)  # classic 7x188 needs mtu >= 1328
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, pay, sink):
            p.add(e)
        src.link(pay); pay.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(data, np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        pkts = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes()) for s in sink.samples]
        assert [len(pk.payload) for pk in pkts] == [1316, 1316]  # 7 x 188
        assert all(pk.payload_type == 33 for pk in pkts)

    def test_mpegtslivesrc_pcr_timestamps(self):
        import socket

        recv = fx.parse_launch(
            "mpegtslivesrc address=127.0.0.1 port=0 num-buffers=3 timeout=2000000000 "
            "! appsink name=sink"
        )
        udp = recv.elements[0]
        udp.set_state(fx.State.PAUSED)
        port = udp.bound_port
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(3):
            pkt = mpegts.build_packet(0x100, b"", pcr=i * 27_000_000)  # 1 s apart
            sock.sendto(pkt, ("127.0.0.1", port))
        recv.play_until_eos()
        sink = recv.by_name("sink")
        assert [s.buffer.pts for s in sink.samples] == [0, 1_000_000_000, 2_000_000_000]
        assert sink.caps.structure(0).name == "video/mpegts"
