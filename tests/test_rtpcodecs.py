"""RTP codec pay/depay tests (RFC framing over synthetic encoded frames)."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net.rtp import RtpPacket


def roundtrip(caps_str, pay_name, depay_name, frames, pay_props=None):
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(caps_str))
    pay = fx.element_factory_make(pay_name)
    pay.set_property("ssrc", 1)
    pay.set_property("seqnum-offset", 0)
    pay.set_property("timestamp-offset", 0)
    for k, v in (pay_props or {}).items():
        pay.set_property(k, v)
    depay = fx.element_factory_make(depay_name)
    sink = fx.element_factory_make("appsink")
    rtp_sink = fx.element_factory_make("appsink", "rtp")
    tee = fx.element_factory_make("tee")
    p = fx.Pipeline()
    for e in (src, pay, tee, depay, sink, rtp_sink):
        p.add(e)
    src.link(pay)
    pay.link(tee)
    tee.request_src_pad().link(depay.pad("sink"))
    tee.request_src_pad().link(rtp_sink.pad("sink"))
    depay.link(sink)
    for i, f in enumerate(frames):
        src.push_buffer(fx.Buffer(np.frombuffer(f, np.uint8), pts=i * 20_000_000))
    src.end_of_stream()
    p.play_until_eos()
    got = [np.asarray(s.buffer.data).tobytes() for s in sink.samples]
    pkts = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes()) for s in rtp_sink.samples]
    return got, pkts, sink


class TestOpus:
    def test_one_frame_per_packet(self):
        frames = [bytes([0xFC, i]) + b"\x01" * 50 for i in range(4)]
        got, pkts, sink = roundtrip("audio/x-opus,channel-mapping-family=0",
                                    "rtpopuspay2", "rtpopusdepay2", frames)
        assert got == frames
        assert len(pkts) == 4
        s = sink.caps.structure(0)
        assert s.name == "audio/x-opus"


class TestAc3:
    def test_whole_frame(self):
        frames = [b"\x0b\x77" + bytes(100)]
        got, pkts, _ = roundtrip("audio/x-ac3,framed=true,rate=48000,alignment=frame",
                                 "rtpac3pay2", "rtpac3depay2", frames)
        assert got == frames
        assert pkts[0].payload[:2] == bytes([0, 1])  # FT=0 NF=1
        assert pkts[0].marker

    def test_fragmented_frame(self):
        frames = [b"\x0b\x77" + bytes(range(256)) * 12]  # 3074 bytes > mtu
        got, pkts, _ = roundtrip("audio/x-ac3,framed=true,rate=48000,alignment=frame",
                                 "rtpac3pay2", "rtpac3depay2", frames)
        assert got == frames
        assert len(pkts) >= 3
        assert pkts[0].payload[0] in (1, 2)  # initial fragment
        assert all(p.payload[0] == 3 for p in pkts[1:])
        assert pkts[-1].marker and not pkts[0].marker


class TestMpaMpv:
    def test_mpa_static_pt14(self):
        frames = [b"\xff\xfb" + bytes(400)] * 2
        got, pkts, _ = roundtrip("audio/mpeg,mpegversion=1",
                                 "rtpmpapay2", "rtpmpadepay2", frames)
        assert got == frames
        assert all(p.payload_type == 14 for p in pkts)
        assert all(p.payload[:2] == b"\x00\x00" for p in pkts)

    def test_mpv_fragmentation(self):
        frames = [b"\x00\x00\x01\xb3" + bytes(3000)]
        got, pkts, _ = roundtrip("video/mpeg,mpegversion=2,systemstream=false",
                                 "rtpmpvpay2", "rtpmpvdepay2", frames)
        assert got == frames
        assert all(p.payload_type == 32 for p in pkts)
        assert len(pkts) >= 2 and pkts[-1].marker


class TestAmr:
    def test_single_frame_roundtrip(self):
        # FT=1 (5.15 kbps): 13 payload bytes after the TOC
        frames = [bytes([0x0C]) + bytes(range(13)),
                  bytes([0x0C]) + bytes(range(13, 26))]
        got, pkts, sink = roundtrip("audio/AMR,rate=8000,channels=1",
                                    "rtpamrpay2", "rtpamrdepay2", frames)
        assert got == frames
        assert pkts[0].payload[0] == 0xF0  # CMR = no request
        assert sink.caps.structure(0).name == "audio/AMR"


class TestVp8Vp9Av1:
    def test_vp8_fragmentation(self):
        frames = [bytes([0x30]) + bytes(3000), bytes([0x30]) + bytes(100)]
        got, pkts, _ = roundtrip("video/x-vp8", "rtpvp8pay2", "rtpvp8depay2", frames)
        assert got == frames
        starts = [p.payload[0] & 0x10 for p in pkts]
        assert starts[0] and not starts[1]  # S bit only on frame start

    def test_vp9_b_e_bits(self):
        frames = [bytes(2500)]
        got, pkts, _ = roundtrip("video/x-vp9", "rtpvp9pay2", "rtpvp9depay2", frames)
        assert got == frames
        assert pkts[0].payload[0] & 0x08  # B
        assert pkts[-1].payload[0] & 0x04  # E
        assert pkts[-1].marker

    def test_av1_aggregation_bits(self):
        frames = [bytes(2500), bytes(100)]
        got, pkts, _ = roundtrip("video/x-av1", "rtpav1pay2", "rtpav1depay2", frames)
        assert got == frames
        h0 = pkts[0].payload[0]
        assert h0 & 0x08  # N: new coded video sequence on the first packet
        assert not (h0 & 0x80)  # Z clear on first
        assert pkts[1].payload[0] & 0x80  # continuation fragment


class TestJpeg:
    def _encode(self, subsampling):
        from PIL import Image

        arr = (np.mgrid[0:64, 0:96][0] * 4).astype(np.uint8)
        img = Image.fromarray(np.stack([arr, arr[::-1], arr], -1), "RGB")
        bio = __import__("io").BytesIO()
        img.save(bio, "JPEG", quality=85, subsampling=subsampling)
        return bio.getvalue(), np.asarray(img)

    @pytest.mark.parametrize("subsampling,jtype", [(1, 0), (2, 1)])
    def test_roundtrip_decodable(self, subsampling, jtype):
        from PIL import Image

        jpg, ref = self._encode(subsampling)
        got, pkts, _ = roundtrip("image/jpeg", "rtpjpegpay2", "rtpjpegdepay2", [jpg])
        assert len(got) == 1
        assert all(p.payload_type == 26 for p in pkts)
        assert pkts[0].payload[4] == jtype
        out = np.asarray(Image.open(__import__("io").BytesIO(got[0])).convert("RGB"))
        assert out.shape == ref.shape
        # recompression-free path: entropy data is untouched, so the decode
        # should match PIL's own decode of the original exactly
        orig = np.asarray(Image.open(__import__("io").BytesIO(jpg)).convert("RGB"))
        assert (out == orig).all()

    def test_fragmented_large_image(self):
        from PIL import Image

        rng = np.random.default_rng(5)
        img = Image.fromarray(rng.integers(0, 255, (256, 256, 3), np.uint8), "RGB")
        bio = __import__("io").BytesIO()
        img.save(bio, "JPEG", quality=95, subsampling=2)
        jpg = bio.getvalue()
        got, pkts, _ = roundtrip("image/jpeg", "rtpjpegpay2", "rtpjpegdepay2", [jpg])
        assert len(pkts) > 3  # noisy image exceeds several MTUs
        out = np.asarray(Image.open(__import__("io").BytesIO(got[0])).convert("RGB"))
        orig = np.asarray(Image.open(__import__("io").BytesIO(jpg)).convert("RGB"))
        assert (out == orig).all()


class TestMp4Generic:
    def test_aac_hbr_headers(self):
        frames = [b"\x21\x1b" + bytes(300)]
        got, pkts, sink = roundtrip("audio/mpeg,mpegversion=4,stream-format=raw,rate=48000",
                                    "rtpmp4apay2", "rtpmp4adepay2", frames)
        assert got == frames
        hdr_bits, au_hdr = np.frombuffer(pkts[0].payload[:4], ">u2")
        assert hdr_bits == 16
        assert au_hdr >> 3 == len(frames[0])  # 13-bit AU size
        s = sink.caps.structure(0)
        assert s["mpegversion"] == 4

    def test_mp4g_video(self):
        frames = [bytes(5000)]
        got, pkts, _ = roundtrip("video/mpeg,mpegversion=4,systemstream=false",
                                 "rtpmp4gpay2", "rtpmp4gdepay2", frames)
        assert got == frames
        assert len(pkts) >= 4


class TestMpaRobust:
    @staticmethod
    def adu(payload, cont=False):
        size = len(payload)
        c = 0x80 if cont else 0
        if size < 64 and not cont:
            return bytes([c | size]) + payload
        return bytes([c | 0x40 | (size >> 8), size & 0xFF]) + payload

    def _depay(self, packets):
        from gst_plugins_rs_tpu.net.rtp import RtpPacket as RP

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp,media=audio,encoding-name=MPA-ROBUST,clock-rate=90000"))
        depay = fx.element_factory_make("rtpmparobustdepay2")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, depay, sink):
            p.add(e)
        src.link(depay); depay.link(sink)
        for i, payload in enumerate(packets):
            pkt = RP(96, i, i * 1000, 3, payload)
            src.push_buffer(fx.Buffer(np.frombuffer(pkt.to_bytes(), np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        return sink

    def test_whole_adus_and_caps(self):
        from gst_plugins_rs_tpu.net.mpa import build_frame_header

        hdr = build_frame_header(version=1, layer=3, rate_idx=0, channels=2)
        adu1 = hdr + bytes(30)
        adu2 = hdr + bytes(25)
        sink = self._depay([self.adu(adu1) + self.adu(adu2)])
        got = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert got == adu1 + adu2
        s = sink.caps.structure(0)
        assert s["rate"] == 44100 and s["channels"] == 2 and s["layer"] == 3

    def test_fragmented_adu(self):
        from gst_plugins_rs_tpu.net.mpa import build_frame_header

        hdr = build_frame_header()
        big = hdr + bytes(range(256)) * 2  # 516 bytes, 2-byte descriptors
        first, rest = big[:300], big[300:]
        pkts = [self.adu(first)[:2] + first]  # descriptor says full size
        # build manually: descriptor with total size, then partial payload
        d_total = bytes([0x40 | (len(big) >> 8), len(big) & 0xFF])
        pkts = [d_total + first,
                bytes([0x80 | 0x40 | (len(big) >> 8), len(big) & 0xFF]) + rest]
        sink = self._depay(pkts)
        got = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert got == big


class TestMpaHeader:
    def test_header_roundtrip(self):
        from gst_plugins_rs_tpu.net.mpa import build_frame_header, peek_frame_header

        h = peek_frame_header(build_frame_header(version=1, layer=3,
                                                 bitrate_idx=9, rate_idx=0))
        assert (h.version, h.layer, h.bitrate_kbps, h.sample_rate) == (1, 3, 128, 44100)
        assert h.samples_per_frame == 1152
        assert h.frame_len == 144 * 128000 // 44100

    def test_bad_sync_rejected(self):
        from gst_plugins_rs_tpu.net.mpa import peek_frame_header

        assert peek_frame_header(b"\x00\x00\x00\x00") is None
