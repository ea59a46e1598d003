"""Round-3 RTP surface behaviors: frame aggregation (RFC 4184/2250/3640
multi-frame packets), VP8/VP9 PictureID, depay keyframe recovery, Opus
DTX suppression, rtpsend/rtprecv session knobs."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import Buffer, Harness
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net.rtp import RtpPacket


def _pay(name, props=None, caps="audio/x-ac3,framed=true,rate=48000,alignment=frame"):
    el = fx.element_factory_make(name)
    el.set_property("seqnum-offset", 0)
    el.set_property("timestamp-offset", 0)
    el.set_property("ssrc", 7)
    for k, v in (props or {}).items():
        el.set_property(k, v)
    h = Harness(el)
    h.set_src_caps(parse_caps(caps))
    return el, h


class TestAggregation:
    def test_ac3_aggregate_packs_frames(self):
        el, h = _pay("rtpac3pay2", {"aggregate-mode": "aggregate"})
        for i in range(3):
            h.push(Buffer(np.full(100, i, np.uint8), pts=i * 32_000_000,
                          duration=32_000_000))
        assert h.buffers_received() == 0  # still aggregating
        h.push_eos()
        pkts = h.pull_all()
        assert len(pkts) == 1
        pkt = RtpPacket.parse(np.asarray(pkts[0].data).tobytes())
        assert pkt.payload[0] == 0 and pkt.payload[1] == 3  # FT=0, NF=3
        assert len(pkt.payload) == 2 + 300

    def test_ac3_max_ptime_bounds_packet(self):
        el, h = _pay("rtpac3pay2", {"aggregate-mode": "aggregate",
                                    "max-ptime": 64_000_000})
        for i in range(4):
            h.push(Buffer(np.full(100, i, np.uint8), pts=i * 32_000_000,
                          duration=32_000_000))
        h.push_eos()
        pkts = h.pull_all()
        assert len(pkts) == 2  # 2 x 64ms
        for p in pkts:
            pkt = RtpPacket.parse(np.asarray(p.data).tobytes())
            assert pkt.payload[1] == 2

    def test_zero_latency_sends_immediately(self):
        el, h = _pay("rtpac3pay2", {"aggregate-mode": "zero-latency"})
        h.push(Buffer(np.zeros(100, np.uint8), pts=0, duration=32_000_000))
        assert h.buffers_received() == 1

    def test_mp4a_aggregate_roundtrip(self):
        el, h = _pay("rtpmp4apay2", {"aggregate-mode": "aggregate"},
                     caps="audio/mpeg,mpegversion=4,stream-format=raw,rate=48000")
        frames = [bytes([0x20 + i]) * (30 + i) for i in range(3)]
        for i, f in enumerate(frames):
            h.push(Buffer(np.frombuffer(f, np.uint8), pts=i * 21_000_000,
                          duration=21_000_000))
        h.push_eos()
        pkts = h.pull_all()
        assert len(pkts) == 1
        # depay splits it back into 3 AUs
        dep = fx.element_factory_make("rtpmp4adepay2")
        hd = Harness(dep)
        hd.set_src_caps(parse_caps(
            "application/x-rtp,media=audio,encoding-name=MPEG4-GENERIC,"
            "clock-rate=48000,mode=AAC-hbr"))
        hd.push(pkts[0])
        out = hd.pull_all()
        assert [np.asarray(o.data).tobytes() for o in out] == frames


class TestPictureId:
    def test_vp8_picture_id_15bit_increments_per_frame(self):
        el, h = _pay("rtpvp8pay2", {"picture-id-mode": "15-bit",
                                    "picture-id-offset": 100},
                     caps="video/x-vp8")
        for i in range(2):
            h.push(Buffer(np.zeros(50, np.uint8), pts=i * 33_000_000))
        pkts = h.pull_all()
        ids = []
        for p in pkts:
            pkt = RtpPacket.parse(np.asarray(p.data).tobytes())
            b0, x, pid_hi, pid_lo = pkt.payload[:4]
            assert b0 & 0x80 and x & 0x80 and pid_hi & 0x80
            ids.append(((pid_hi & 0x7F) << 8) | pid_lo)
        assert ids == [100, 101]
        assert el.get_property("picture-id") == 102

    def test_vp8_depay_strips_picture_id(self):
        pay, hp = _pay("rtpvp8pay2", {"picture-id-mode": "7-bit",
                                      "picture-id-offset": 5},
                       caps="video/x-vp8")
        frame = np.arange(60, dtype=np.uint8)
        frame[0] = 0x00  # keyframe bit pattern
        hp.push(Buffer(frame, pts=0))
        dep = fx.element_factory_make("rtpvp8depay2")
        hd = Harness(dep)
        hd.set_src_caps(parse_caps(
            "application/x-rtp,media=video,encoding-name=VP8,clock-rate=90000"))
        for p in hp.pull_all():
            hd.push(p)
        out = hd.pull_all()
        assert len(out) == 1
        np.testing.assert_array_equal(np.asarray(out[0].data), frame)


class TestKeyframeRecovery:
    def _roundtrip(self, frames, drop_seq, props):
        pay, hp = _pay("rtpvp8pay2", {"mtu": 100},  # force fragmentation
                       caps="video/x-vp8")
        for i, f in enumerate(frames):
            hp.push(Buffer(np.frombuffer(f, np.uint8), pts=i * 33_000_000))
        wire = hp.pull_all()
        dep = fx.element_factory_make("rtpvp8depay2")
        for k, v in props.items():
            dep.set_property(k, v)
        hd = Harness(dep)
        hd.set_src_caps(parse_caps(
            "application/x-rtp,media=video,encoding-name=VP8,clock-rate=90000"))
        for p in wire:
            pkt = RtpPacket.parse(np.asarray(p.data).tobytes())
            if pkt.sequence_number == drop_seq:
                continue
            hd.push(p)
        return hd

    def test_wait_for_keyframe_drops_until_key(self):
        inter = bytes([0x01]) + b"\xBB" * 150   # P=1: inter frame
        key = bytes([0x00]) + b"\xAA" * 150     # P=0: keyframe
        # drop a fragment of frame 0 (key), frame1 inter is then dropped,
        # frame2 key passes
        hd = self._roundtrip([key, inter, key], drop_seq=1,
                             props={"wait-for-keyframe": True})
        out = hd.pull_all()
        assert len(out) == 1
        assert np.asarray(out[0].data).tobytes()[0] == 0x00

    def test_request_keyframe_sends_upstream_event(self):
        inter = bytes([0x01]) + b"\xBB" * 150
        key = bytes([0x00]) + b"\xAA" * 150
        hd = self._roundtrip([key, inter, key], drop_seq=1,
                             props={"request-keyframe": True})
        from gst_plugins_rs_tpu.core.events import EventType

        assert any(e.type == EventType.CUSTOM_UPSTREAM
                   and e.get("name") == "GstForceKeyUnit"
                   for e in hd.src_events)


class TestOpusDtx:
    def test_dtx_suppresses_short_frames(self):
        el, h = _pay("rtpopuspay2", {"dtx": True},
                     caps="audio/x-opus,channel-mapping-family=0")
        h.push(Buffer(np.zeros(1, np.uint8), pts=0))   # DTX frame
        h.push(Buffer(np.zeros(40, np.uint8), pts=20_000_000))
        assert h.buffers_received() == 1


class TestSessionSurface:
    def test_rtpsend_stats_and_min_interval(self):
        import gst_plugins_rs_tpu as fx2

        send = fx2.element_factory_make("rtpsend")
        send.set_property("min-rtcp-interval", 100_000_000)
        sink = send.request_sink_pad("rtp_sink_0")
        pkt = RtpPacket(payload_type=96, sequence_number=0, timestamp=0,
                        ssrc=42, payload=b"x" * 10)
        # unlinked src: NOT_LINKED is fine, stats must still count
        sink.chain_function(sink, Buffer(np.frombuffer(pkt.to_bytes(), np.uint8), pts=0))
        stats = send.get_property("stats")
        assert stats["ssrc-42"]["packets-sent"] == 1

    def test_rtprecv_timestamping_rtp_mode(self):
        recv = fx.element_factory_make("rtprecv")
        recv.set_property("timestamping-mode", "rtp")
        sink = recv.request_sink_pad()
        appsink = fx.element_factory_make("appsink")
        recv.link(appsink)

        def push(seq, ts, pts):
            pkt = RtpPacket(payload_type=96, sequence_number=seq,
                            timestamp=ts, ssrc=9, payload=b"z")
            sink.chain_function(
                sink, Buffer(np.frombuffer(pkt.to_bytes(), np.uint8), pts=pts),
                "0")

        # arrival pts jitters; rtp mode derives smooth pts from RTP ts
        push(0, 0, 1_000_000)
        push(1, 90_000, 1_500_000)  # 1s of rtp time @90kHz
        pts = [s.buffer.pts for s in appsink.samples]
        assert pts[0] == 1_000_000
        assert pts[1] == 1_000_000 + 1_000_000_000
        stats = recv.get_property("stats")
        assert stats["ssrc-9"]["packets-received"] == 2


class TestAmrWb:
    def test_wb_roundtrip(self):
        from gst_plugins_rs_tpu.elements.net.rtpcodecs import _AMR_WB_SIZES

        pay, hp = _pay("rtpamrpay2", {"aggregate-mode": "zero-latency"},
                       caps="audio/AMR-WB,rate=16000,channels=1")
        # one WB frame: TOC FT=2 (12.65 kbps, 32 bytes) + body
        toc = (2 << 3) | 0x04
        frame = bytes([toc]) + bytes(range(_AMR_WB_SIZES[2]))
        hp.push(Buffer(np.frombuffer(frame, np.uint8), pts=0))
        pkts = hp.pull_all()
        assert len(pkts) == 1
        pkt = RtpPacket.parse(np.asarray(pkts[0].data).tobytes())
        dep = fx.element_factory_make("rtpamrdepay2")
        hd = Harness(dep)
        hd.set_src_caps(parse_caps(
            "application/x-rtp,media=audio,encoding-name=AMR-WB,"
            "clock-rate=16000,octet-align=(string)1"))
        assert hd.out_caps().structure(0).name == "audio/AMR-WB"
        hd.push(pkts[0])
        out = hd.pull_all()
        assert len(out) == 1
        got = np.asarray(out[0].data).tobytes()
        assert got == bytes([toc & 0x7C]) + bytes(range(_AMR_WB_SIZES[2]))
        assert pkt.payload[0] == 0xF0  # CMR


class TestMp4gAudio:
    def test_aac_over_mp4g(self):
        pay, hp = _pay("rtpmp4gpay2", {},
                       caps="audio/mpeg,mpegversion=4,stream-format=raw,rate=48000")
        au = bytes(range(64))
        hp.push(Buffer(np.frombuffer(au, np.uint8), pts=0))
        pkts = hp.pull_all()
        pkt = RtpPacket.parse(np.asarray(pkts[0].data).tobytes())
        # AU-headers-length 16 bits + one 13-bit size header
        assert pkt.payload[:2] == b"\x00\x10"


class TestTtToCea608Json:
    def test_json_record_input(self):
        from gst_plugins_rs_tpu.ops import cea608

        el = fx.element_factory_make("tttocea608")
        el.set_property("mode", "pop-on")
        h = Harness(el)
        h.set_src_caps(parse_caps("application/x-json"))
        h.push(Buffer('{"lines": [{"text": "HELLO"}, {"text": "WORLD"}]}',
                      pts=0))
        pairs = np.asarray(h.pull().data, np.uint8)
        dec = cea608.Cea608Decoder()
        for hi, lo in pairs:
            dec.push_pair(int(hi), int(lo))
        caps = [e for e in dec.take_events() if e is not None]
        assert caps and caps[0].lines == ["HELLO", "WORLD"]
