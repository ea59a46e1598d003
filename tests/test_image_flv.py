"""Image codecs (rspngenc/gifenc/gifdec/imagersdec), imagersoverlay,
CD+G (cdgparse/cdgdec), and FLV demux (rsflvdemux) tests.

Oracles: PIL re-decode for encoders (independent of the element path),
hand-built CD+G packets and FLV tag streams per the public specs.
"""
import io
import struct

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.elements.image.cdg import CDG_HEIGHT, CDG_WIDTH, CdgRenderer


def run_video_pipeline(desc):
    p = fx.parse_launch(desc)
    p.play_until_eos()
    return p


class TestPngGif:
    def test_pngenc_roundtrip(self):
        p = run_video_pipeline(
            "videotestsrc pattern=smpte num-buffers=1 "
            "! video/x-raw,format=RGB,width=64,height=48,framerate=30/1 "
            "! rspngenc ! appsink name=sink"
        )
        data = np.asarray(p.by_name("sink").samples[0].buffer.data).tobytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(data)))
        q = run_video_pipeline(
            "videotestsrc pattern=smpte num-buffers=1 "
            "! video/x-raw,format=RGB,width=64,height=48,framerate=30/1 ! appsink name=sink"
        )
        ref = np.asarray(q.by_name("sink").samples[0].buffer.data)
        assert (img == ref).all()  # PNG is lossless

    def test_gif_enc_dec_chain(self):
        # distinct solid-color frames (PIL merges identical GIF frames)
        refs = [np.full((16, 32, 3), c, np.uint8) for c in (0, 120, 240)]
        src = fx.element_factory_make("appsrc")
        src.set_property(
            "caps", parse_caps("video/x-raw,format=RGB,width=32,height=16,framerate=10/1")
        )
        enc = fx.element_factory_make("gifenc")
        enc.set_property("repeat", 0)
        dec = fx.element_factory_make("gifdec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dec, sink):
            p.add(e)
        src.link(enc); enc.link(dec); dec.link(sink)
        for i, r in enumerate(refs):
            src.push_buffer(fx.Buffer(r, pts=i * 100_000_000, duration=100_000_000))
        src.end_of_stream()
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data) for s in sink.samples]
        assert len(frames) == 3
        assert frames[0].shape[:2] == (16, 32)
        for got, ref in zip(frames, refs):
            assert np.abs(got[..., :3].astype(int) - ref.astype(int)).mean() < 16
        # durations survive the GIF (ms granularity)
        assert sink.samples[0].buffer.duration == 100_000_000

    def test_imagersdec_jpeg(self):
        from PIL import Image

        arr = (np.mgrid[0:32, 0:48][0] * 8).astype(np.uint8)
        img = Image.fromarray(np.stack([arr] * 3, -1), "RGB")
        bio = io.BytesIO()
        img.save(bio, "JPEG", quality=95)

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("image/jpeg"))
        dec = fx.element_factory_make("imagersdec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, dec, sink):
            p.add(e)
        src.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(bio.getvalue(), np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        out = np.asarray(sink.samples[0].buffer.data)
        assert out.shape == (32, 48, 3)
        assert np.abs(out.astype(int) - np.asarray(img).astype(int)).mean() < 4


class TestImageOverlay:
    def test_overlay_bottom_right(self, tmp_path):
        from PIL import Image

        logo = np.zeros((8, 8, 4), np.uint8)
        logo[:, :, 0] = 255  # red
        logo[:, :, 3] = 255  # opaque
        path = tmp_path / "logo.png"
        Image.fromarray(logo, "RGBA").save(path)

        p = run_video_pipeline(
            "videotestsrc pattern=black num-buffers=1 "
            "! video/x-raw,format=RGB,width=64,height=32,framerate=30/1 "
            f"! imagersoverlay location={path} offset-x=-4 offset-y=-4 "
            "! appsink name=sink"
        )
        f = np.asarray(p.by_name("sink").samples[0].buffer.data)
        # negative offsets anchor to the right/bottom edge (overlay/imp.rs:126-143)
        assert (f[20:28, 52:60, 0] == 255).all()
        assert (f[:16, :48] == 0).all()


class TestCdg:
    @staticmethod
    def packet(instr, data16):
        pkt = bytearray(24)
        pkt[0] = 0x09
        pkt[1] = instr
        pkt[4 : 4 + len(data16)] = data16
        return bytes(pkt)

    def test_renderer_tile_and_palette(self):
        r = CdgRenderer()
        # palette: color 0 = black, color 1 = white (load low table)
        colors = bytearray(16)
        colors[2] = (0xF << 2) | 0x3  # entry 1: r=15, g hi bits
        colors[3] = (0x3 << 4) | 0xF  # g lo, b=15
        r.push_packet(self.packet(30, bytes(colors)))
        assert tuple(r.palette[1]) == (255, 255, 255)
        # memory preset to color 0
        r.push_packet(self.packet(1, bytes([0, 0] + [0] * 14)))
        # tile at row 1, col 2: all pixels color 1
        tile = bytes([0, 1, 1, 2] + [0x3F] * 12)
        r.push_packet(self.packet(6, tile))
        frame = r.frame_rgb()
        assert frame.shape == (CDG_HEIGHT, CDG_WIDTH, 3)
        assert (frame[12:24, 12:18] == 255).all()
        assert (frame[0:12, :] == 0).all()

    def test_xor_tile(self):
        r = CdgRenderer()
        tile = bytes([0, 1, 0, 0] + [0x3F] * 12)
        r.push_packet(self.packet(6, tile))
        # normal tile wrote color 1 everywhere; XOR with itself gives 1^1=0
        r.push_packet(self.packet(38, tile))
        assert (r.surface[:12, :6] == 0).all()

    def test_pipeline_parse_and_decode(self):
        stream = b"".join(
            [
                self.packet(30, bytes(16)),  # palette (all black)
                self.packet(1, bytes([2, 0] + [0] * 14)),  # preset color 2
                bytes(24),  # non-command packet: ignored
            ]
        )
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-cdg"))
        parse = fx.element_factory_make("cdgparse")
        dec = fx.element_factory_make("cdgdec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, parse, dec, sink):
            p.add(e)
        src.link(parse); parse.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(stream, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data) for s in sink.samples]
        assert len(frames) == 2  # palette load + preset are dirty; padding is not
        assert frames[-1].shape == (CDG_HEIGHT, CDG_WIDTH, 3)
        # pts paced at 300 packets/s
        assert sink.samples[1].buffer.pts == 1_000_000_000 // 300


def make_flv(tags):
    """Build an FLV byte stream: tags = [(type, ts_ms, body bytes)]."""
    out = bytearray(b"FLV\x01\x05" + struct.pack(">I", 9) + b"\x00\x00\x00\x00")
    for t, ts, body in tags:
        tag = bytearray()
        tag.append(t)
        tag += len(body).to_bytes(3, "big")
        tag += (ts & 0xFFFFFF).to_bytes(3, "big")
        tag.append((ts >> 24) & 0xFF)
        tag += b"\x00\x00\x00"
        tag += body
        out += tag + struct.pack(">I", len(tag))
    return bytes(out)


class TestFlvDemux:
    def test_mulaw_audio_roundtrip(self):
        # FLV with mu-law audio (sound format 8): header nibble 8<<4,
        # rate bits irrelevant for G.711, mono 8-bit flags
        payloads = [bytes([i] * 160) for i in (10, 20, 30)]
        tags = [(8, i * 20, bytes([0x80]) + p) for i, p in enumerate(payloads)]
        flv = make_flv(tags)

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-flv"))
        demux = fx.element_factory_make("rsflvdemux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, demux, sink):
            p.add(e)
        src.link(demux)
        demux.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(flv, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        assert len(sink.samples) == 3
        assert sink.caps.structure(0).name == "audio/x-mulaw"
        assert sink.caps.structure(0)["rate"] == 8000
        got = [np.asarray(s.buffer.data).tobytes() for s in sink.samples]
        assert got == payloads
        assert [s.buffer.pts for s in sink.samples] == [0, 20_000_000, 40_000_000]

    def test_avc_video_with_codec_data(self):
        avcc = bytes([1, 0x64, 0, 40, 0xFF])
        tags = [
            (9, 0, bytes([0x17, 0x00, 0, 0, 0]) + avcc),  # keyframe, AVC seq header
            (9, 33, bytes([0x17, 0x01, 0, 0, 0]) + b"NALU1"),  # keyframe NALU
            (9, 66, bytes([0x27, 0x01, 0, 0, 0]) + b"NALU2"),  # inter frame
        ]
        flv = make_flv(tags)
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-flv"))
        demux = fx.element_factory_make("rsflvdemux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, demux, sink):
            p.add(e)
        src.link(demux)
        demux.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(flv, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        s = sink.caps.structure(0)
        assert s.name == "video/x-h264"
        assert s["codec_data"] == avcc
        bodies = [np.asarray(x.buffer.data).tobytes() for x in sink.samples]
        assert bodies == [b"NALU1", b"NALU2"]
        assert not sink.samples[0].buffer.has_flag(fx.BufferFlags.DELTA_UNIT)
        assert sink.samples[1].buffer.has_flag(fx.BufferFlags.DELTA_UNIT)

    def test_flv_to_mulawdec_chain(self):
        """Demuxed G.711 feeds the device decoder end to end."""
        import audioop

        pcm = (np.sin(np.linspace(0, 40, 320)) * 20000).astype(np.int16)
        ulaw = audioop.lin2ulaw(pcm.tobytes(), 2)
        flv = make_flv([(8, 0, bytes([0x80]) + ulaw)])
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-flv"))
        demux = fx.element_factory_make("rsflvdemux")
        dec = fx.element_factory_make("mulawdec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, demux, dec, sink):
            p.add(e)
        src.link(demux); demux.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(flv, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        out = sink.concat_audio().ravel()
        ref = np.frombuffer(audioop.ulaw2lin(ulaw, 2), np.int16)
        assert (out == ref).all()
