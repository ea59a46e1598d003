"""RTP family tests: G.711 companding (audioop oracle), RFC 3550
packetization, pay/depay round-trips, and a real UDP loopback.

Mirrors the reference test strategy (net/rtp/src/pcmau/tests.rs,
linear_audio/tests.rs: payload -> depayload pipelines asserting exact
payload recovery and timestamping).
"""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.net.rtp import RtpPacket, SeqnumTracker, TimestampTracker
from gst_plugins_rs_tpu.ops import g711

audioop = pytest.importorskip("audioop")  # CPython <=3.12 ITU G.711 oracle


class TestG711:
    def test_alaw_encode_bit_exact(self):
        pcm = np.arange(-32768, 32768, dtype=np.int16)
        ref = np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), np.uint8)
        got = np.asarray(g711.alaw_encode(pcm))
        assert (ref == got).all()

    def test_mulaw_encode_bit_exact(self):
        pcm = np.arange(-32768, 32768, dtype=np.int16)
        ref = np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8)
        got = np.asarray(g711.mulaw_encode(pcm))
        assert (ref == got).all()

    def test_decode_bit_exact(self):
        codes = np.arange(256, dtype=np.uint8)
        assert (
            np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), np.int16)
            == np.asarray(g711.alaw_decode(codes))
        ).all()
        assert (
            np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), np.int16)
            == np.asarray(g711.mulaw_decode(codes))
        ).all()

    def test_elements_roundtrip_close(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=5 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! alawdec ! appsink name=sink"
        )
        p.play_until_eos()
        out = p.by_name("sink").concat_audio()
        assert out.dtype == np.int16
        assert out.shape == (4000, 1)
        # A-law SNR on a sine should be ~37 dB
        q = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=5 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 ! appsink name=sink"
        )
        q.play_until_eos()
        ref = q.by_name("sink").concat_audio().astype(np.float64)
        err = out.astype(np.float64) - ref
        snr = 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1))
        assert snr > 30


class TestPacket:
    def test_roundtrip(self):
        pkt = RtpPacket(
            payload_type=96, sequence_number=65535, timestamp=0xFFFFFFF0,
            ssrc=0xDEADBEEF, payload=b"hello", marker=True,
            csrcs=(1, 2), extension=(0xBEDE, b"\x10\x01\x00\x00"),
        )
        got = RtpPacket.parse(pkt.to_bytes())
        assert got == pkt

    def test_rejects_bad_version(self):
        with pytest.raises(ValueError):
            RtpPacket.parse(b"\x00" * 12)

    def test_seqnum_wrap_and_gap(self):
        t = SeqnumTracker()
        assert t.update(65534) == (65534, 1)
        assert t.update(65535) == (65535, 1)
        assert t.update(0) == (65536, 1)  # wrap extends
        assert t.update(3)[1] == 3  # gap of 3 (2 lost)

    def test_timestamp_wrap(self):
        t = TimestampTracker()
        t.update(0xFFFFFF00)
        assert t.update(0x00000100) == 0x100000100


class TestPayDepay:
    def test_pcma_roundtrip_exact(self):
        # sine -> alawenc -> rtp pay -> depay -> alawdec; companded bytes
        # survive the RTP hop bit-exactly
        enc = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=4 samplesperbuffer=1600 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! appsink name=sink"
        )
        enc.play_until_eos()
        companded = np.concatenate(
            [np.asarray(s.buffer.data) for s in enc.by_name("sink").samples]
        )

        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=4 samplesperbuffer=1600 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! rtppcmapay2 ssrc=42 seqnum-offset=100 timestamp-offset=0 "
            "! rtppcmadepay2 ! appsink name=sink"
        )
        p.play_until_eos()
        sink = p.by_name("sink")
        got = np.concatenate([np.asarray(s.buffer.data) for s in sink.samples])
        assert (got == companded).all()
        assert sink.caps.structure(0).name == "audio/x-alaw"
        assert sink.caps.structure(0)["rate"] == 8000

    def test_packet_headers(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! mulawenc ! rtppcmupay2 ssrc=7 seqnum-offset=65535 timestamp-offset=0 "
            "! appsink name=sink"
        )
        p.play_until_eos()
        sink = p.by_name("sink")
        s = sink.caps.structure(0)
        assert s["encoding-name"] == "PCMU" and s["payload"] == 0  # static PT 0
        pkts = [RtpPacket.parse(np.asarray(x.buffer.data).tobytes()) for x in sink.samples]
        # 800-sample buffers exceed mtu(1200)-12=1188 -> split 1188+... wait bpf=1
        assert all(p.ssrc == 7 for p in pkts)
        seqs = [p.sequence_number for p in pkts]
        assert seqs[0] == 65535 and seqs[1] == 0  # wraps
        # rtp time advances by payload frames @ clock-rate
        sizes = [len(p.payload) for p in pkts]
        ts = [p.timestamp for p in pkts]
        for i in range(1, len(pkts)):
            assert ts[i] - ts[i - 1] == sizes[i - 1]

    def test_mtu_fragmentation(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=4000 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! mulawenc ! rtppcmupay2 mtu=1012 ssrc=1 seqnum-offset=0 timestamp-offset=0 "
            "! appsink name=sink"
        )
        p.play_until_eos()
        pkts = [RtpPacket.parse(np.asarray(x.buffer.data).tobytes())
                for x in p.by_name("sink").samples]
        assert [len(pk.payload) for pk in pkts] == [1000, 1000, 1000, 1000]
        assert [pk.timestamp for pk in pkts] == [0, 1000, 2000, 3000]

    def test_l16_network_byte_order(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=441 "
            "! audio/x-raw,format=S16,rate=44100,channels=2 "
            "! rtpL16pay2 pt=10 ssrc=5 seqnum-offset=0 timestamp-offset=0 "
            "! rtpL16depay2 ! appsink name=sink"
        )
        p.play_until_eos()
        sink = p.by_name("sink")
        out = sink.concat_audio()
        q = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=441 "
            "! audio/x-raw,format=S16,rate=44100,channels=2 ! appsink name=sink"
        )
        q.play_until_eos()
        assert (out == q.by_name("sink").concat_audio()).all()
        assert sink.caps.structure(0)["format"] == "S16"
        assert sink.caps.structure(0)["channels"] == 2

    def test_klv_fragment_reassembly(self):
        # one 3000-byte KLV unit through mtu=512 packets
        payload = np.arange(3000, dtype=np.int64).astype(np.uint8)
        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-klv,parsed=true"))
        pay = fx.element_factory_make("rtpklvpay2")
        pay.set_property("mtu", 512)
        pay.set_property("ssrc", 9)
        pay.set_property("seqnum-offset", 0)
        pay.set_property("timestamp-offset", 0)
        depay = fx.element_factory_make("rtpklvdepay2")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, pay, depay, sink):
            p.add(e)
        src.link(pay); pay.link(depay); depay.link(sink)
        src.push_buffer(fx.Buffer(payload, pts=0, duration=1000000))
        src.end_of_stream()
        p.play_until_eos()
        outs = sink.samples
        assert len(outs) == 1
        assert (np.asarray(outs[0].buffer.data) == payload).all()
        assert outs[0].buffer.pts == 0


class TestUdpLoopback:
    def test_datagrams_roundtrip(self):
        recv = fx.parse_launch(
            "udpsrc2 address=127.0.0.1 port=0 num-buffers=4 timeout=2000000000 "
            'caps="application/x-rtp,media=audio,encoding-name=PCMA,clock-rate=8000,encoding-params=1,payload=8" '
            "! rtppcmadepay2 ! alawdec ! appsink name=sink"
        )
        # bind the receiver socket first (PAUSED), then run the sender
        udp = recv.elements[0]
        udp.set_state(fx.State.PAUSED)
        port = udp.bound_port

        send = fx.parse_launch(
            "audiotestsrc wave=ticks num-buffers=4 samplesperbuffer=800 "
            "! audio/x-raw,format=S16,rate=8000,channels=1 "
            "! alawenc ! rtppcmapay2 ssrc=3 seqnum-offset=0 timestamp-offset=0 "
            f"! ts-udpsink host=127.0.0.1 port={port}"
        )
        send.play_until_eos()

        recv.play_until_eos()
        out = recv.by_name("sink").concat_audio()
        assert out.shape == (3200, 1)
        assert out.dtype == np.int16
        assert np.abs(out.astype(np.int32)).max() > 1000  # ticks made it across
