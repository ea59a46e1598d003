"""L20/L24 linear audio, RFC 4175 raw video, and RFC 8331 SMPTE-291 RTP
pay/depay round trips."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.elements.net.rtpextra import _pack20, _unpack20
from gst_plugins_rs_tpu.ops import st2038


def _audio_roundtrip(caps_str, pay_name, depay_name, frames):
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps(caps_str))
    pay = fx.element_factory_make(pay_name)
    pay.set_property("ssrc", 7)
    pay.set_property("seqnum-offset", 0)
    pay.set_property("timestamp-offset", 0)
    depay = fx.element_factory_make(depay_name)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    for e in (src, pay, depay, sink):
        p.add(e)
    src.link(pay)
    pay.link(depay)
    depay.link(sink)
    for i, f in enumerate(frames):
        src.push_buffer(fx.Buffer(f, pts=i * 20_000_000))
    src.end_of_stream()
    p.play_until_eos()
    return sink


class TestL24:
    def test_roundtrip_stereo(self):
        rng = np.random.default_rng(0)
        frames = [rng.integers(-(1 << 23), 1 << 23, (480, 2), dtype=np.int32)
                  for _ in range(3)]
        sink = _audio_roundtrip("audio/x-raw,format=S24,rate=48000,channels=2,layout=interleaved",
                                "rtpL24pay2", "rtpL24depay2", frames)
        got = np.concatenate([np.asarray(s.buffer.data) for s in sink.samples])
        expect = np.concatenate(frames)
        np.testing.assert_array_equal(got, expect)
        s = sink.samples[0].caps.structure(0)
        assert s["format"] == "S24" and s["channels"] == 2


class TestL20:
    def test_pack20_vectors(self):
        # two samples -> exactly 5 bytes, bit-contiguous big-endian
        raw = _pack20(np.array([0xABCDE, 0x12345], np.int64))
        assert raw == bytes([0xAB, 0xCD, 0xE1, 0x23, 0x45])
        vals = _unpack20(raw)
        assert list(vals & 0xFFFFF) == [0xABCDE, 0x12345]

    def test_sign_extension(self):
        vals = _unpack20(_pack20(np.array([-1, -(1 << 19), (1 << 19) - 1], np.int64)))
        # 3 samples = 60 bits -> padded to 64; the pad adds no 20-bit group
        assert list(vals) == [-1, -(1 << 19), (1 << 19) - 1]

    def test_roundtrip_stereo(self):
        rng = np.random.default_rng(1)
        # frames*channels multiple of 2 keeps the payload byte-aligned
        frames = [rng.integers(-(1 << 19), 1 << 19, (480, 2), dtype=np.int32)
                  for _ in range(3)]
        sink = _audio_roundtrip("audio/x-raw,format=S20,rate=48000,channels=2,layout=interleaved",
                                "rtpL20pay", "rtpL20depay", frames)
        got = np.concatenate([np.asarray(s.buffer.data) for s in sink.samples])
        np.testing.assert_array_equal(got, np.concatenate(frames))


class TestVRaw:
    @pytest.mark.parametrize("fmt,channels", [("RGB", 3), ("RGBA", 4)])
    def test_frame_roundtrip(self, fmt, channels):
        rng = np.random.default_rng(2)
        w, h = 64, 48
        frames = [rng.integers(0, 256, (h, w, channels), dtype=np.uint8) for _ in range(2)]
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps(f"video/x-raw,format={fmt},width={w},height={h}"))
        pay = fx.element_factory_make("rtpvrawpay2")
        pay.set_property("ssrc", 9)
        pay.set_property("seqnum-offset", 0)
        pay.set_property("timestamp-offset", 0)
        depay = fx.element_factory_make("rtpvrawdepay2")
        sink = fx.element_factory_make("appsink")
        rtp_sink = fx.element_factory_make("appsink")
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
            src.push_buffer(fx.Buffer(f, pts=i * 33_000_000))
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 2
        for got, want in zip(sink.samples, frames):
            np.testing.assert_array_equal(np.asarray(got.buffer.data), want)
        # many packets per frame; each frame ends with a marker
        from gst_plugins_rs_tpu.net.rtp import RtpPacket
        pkts = [RtpPacket.parse(np.asarray(s.buffer.data).tobytes())
                for s in rtp_sink.samples]
        assert len(pkts) > 2
        markers = [pk.marker for pk in pkts]
        assert sum(markers) == 2 and markers[-1]
        s = sink.samples[0].caps.structure(0)
        assert s["format"] == fmt and s["width"] == w


class TestSmpte291:
    def test_anc_roundtrip(self):
        anc1 = st2038.pack(0x61, 0x02, b"\x10\x20\x30", line_number=12)
        anc2 = st2038.pack(0x41, 0x05, bytes(range(20)), c_not_y=True,
                           line_number=9, horizontal_offset=100)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("meta/x-st-2038"))
        pay = fx.element_factory_make("rtpsmpte291pay")
        pay.set_property("ssrc", 3)
        pay.set_property("seqnum-offset", 0)
        pay.set_property("timestamp-offset", 0)
        depay = fx.element_factory_make("rtpsmpte291depay")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, pay, depay, sink):
            p.add(e)
        src.link(pay)
        pay.link(depay)
        depay.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(anc1 + anc2, np.uint8), pts=0))
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 1
        out = bytes(np.asarray(sink.samples[0].buffer.data, np.uint8))
        got = st2038.unpack_all(out)
        assert len(got) == 2
        assert (got[0].did, got[0].sdid, got[0].data) == (0x61, 0x02, b"\x10\x20\x30")
        assert got[0].line_number == 12 and not got[0].c_not_y
        assert (got[1].did, got[1].sdid, got[1].data) == (0x41, 0x05, bytes(range(20)))
        assert got[1].c_not_y and got[1].horizontal_offset == 100
        assert all(a.checksum_ok for a in got)
