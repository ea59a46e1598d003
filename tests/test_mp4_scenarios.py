"""Non-fragmented MP4 muxer scenario matrix, mirrored from the reference's
`/root/reference/mux/isobmff/tests/mp4_tests.rs` (2 087 lines) test names.

Coverage: the uncompressed-video format matrix (encode_uncompressed_*,
ISO/IEC 23001-17 uncC/cmpd facts per pixel format), the PCM audio matrix
(encode_uncompressed_audio_*), codec box tests (flac/ac3/eac3_mux_boxes),
mid-stream caps changes building multi-entry stsd with stsc
sample_description_index switching (test_caps_change_with_*), and
generically-compressed raw video (encode/roundtrip_compressed_raw_*:
restricted 'resv' entries with rinf{frma uncv + schm gcmp + schi{cmpC}},
compressenc/brotlicompress upstream, full decode roundtrips).

Not mirrored (rationale): test_basic_x264_aac / test_roundtrip_vp9_flac /
test_roundtrip_av1_aac and the 36 bayer_roundtrip_* variants need real
encoders / bayer sources; encode_uncompressed_image_sequence_* needs the
23008-12 image-sequence handler (documented gap); the *_row_align_0
variants assert a stride this framework never produces (buffers are always
densely packed, so row_align_size is 0 in every uncC this muxer writes —
the non-suffixed tests cover that exact layout).

The expected uncC facts below are transcribed from the reference's
uncompressed.rs:455-770 (component tables, sampling, interleave, pixel
size, Table 5 profiles).
"""
import struct

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import (
    Buffer, Caps, Event, Pad, PadDirection, SECOND, Segment, State)
from gst_plugins_rs_tpu.mux import reader

S = SECOND
MONO, Y, CB, CR, R, G, B, A = range(8)


def _mux_one(caps, frames, *, dur=100 * S // 1000, factory="isomp4mux",
             flags=None):
    mux = fx.element_factory_make(factory)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(mux); p.add(sink)
    pad = mux.request_sink_pad()
    mux.pad("src").link(sink.pad("sink"))
    p.set_state(State.PLAYING)
    pad.send_event(Event.new_stream_start("s0"))
    pad.send_event(Event.new_caps(caps))
    pad.send_event(Event.new_segment(Segment()))
    for i, f in enumerate(frames):
        pad.chain(Buffer(np.frombuffer(f, np.uint8), pts=i * dur,
                         duration=dur))
    pad.send_event(Event.new_eos())
    return b"".join(np.asarray(s.buffer.data).tobytes()
                    for s in sink.samples)



def _mux_one_audio(caps, arr, *, dur):
    mux = fx.element_factory_make("isomp4mux")
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(mux); p.add(sink)
    pad = mux.request_sink_pad()
    mux.pad("src").link(sink.pad("sink"))
    p.set_state(State.PLAYING)
    pad.send_event(Event.new_stream_start("s0"))
    pad.send_event(Event.new_caps(caps))
    pad.send_event(Event.new_segment(Segment()))
    pad.chain(Buffer(arr, pts=0, duration=dur))
    pad.send_event(Event.new_eos())
    return b"".join(np.asarray(s.buffer.data).tobytes()
                    for s in sink.samples)


def _stsd_entries(data):
    tree = reader.parse_boxes(data)
    moov = next(n for n in tree if n.type == b"moov")
    stsd = moov.find(b"trak", b"mdia", b"minf", b"stbl", b"stsd")
    count = struct.unpack(">I", stsd.payload[4:8])[0]
    entries = reader.parse_boxes(stsd.payload, 8, len(stsd.payload))
    assert len(entries) == count
    return entries


def _uncc_facts(entry):
    """Decode the cmpd+uncC children of an uncv/resv sample entry."""
    children = reader.parse_boxes(entry.payload, 78, len(entry.payload))
    by = {c.type: c for c in children}
    out = {"entry_type": entry.type.decode()}
    if b"cmpd" in by:
        p = by[b"cmpd"].payload
        n = struct.unpack(">I", p[:4])[0]
        out["cmpd"] = [struct.unpack(">H", p[4 + 2 * i:6 + 2 * i])[0]
                       for i in range(n)]
    if b"rinf" in by:
        rinf = by[b"rinf"]
        out["frma"] = rinf.find(b"frma").payload[:4]
        out["schm"] = rinf.find(b"schm").payload[4:8]
        out["cmpC"] = rinf.find(b"schi", b"cmpC").payload[4:8]
    u = by[b"uncC"].payload
    version = u[0]
    out["version"] = version
    if version == 1:
        out["profile"] = u[4:8]
        return out
    out["profile"] = u[4:8]
    n = struct.unpack(">I", u[8:12])[0]
    comps = []
    off = 12
    for _ in range(n):
        idx, depth_m1, cfmt, align = struct.unpack(">HBBB", u[off:off + 5])
        comps.append((idx, depth_m1 + 1))
        off += 5
    out["depths"] = [d for _i, d in comps]
    (out["sampling"], out["interleave"], out["block"],
     out["flags"]) = struct.unpack(">BBBB", u[off:off + 4])
    out["pixel_size"], out["row_align"] = struct.unpack(
        ">II", u[off + 4:off + 12])
    return out


def _video_caps(fmt, w=16, h=16):
    return Caps.builder("video/x-raw", format=fmt, width=w, height=h)


# (format, frame_bytes(w,h), expected facts) — facts transcribed from the
# reference's uncompressed.rs tables
_V1 = "v1-profile-only"
UNCOMPRESSED_MATRIX = {
    "rgb": ("RGB", lambda w, h: 3 * w * h, _V1, b"rgb3"),
    "bgr": ("BGR", lambda w, h: 3 * w * h,
            dict(cmpd=[B, G, R], sampling=0, interleave=1, pixel_size=3)),
    "rgba": ("RGBA", lambda w, h: 4 * w * h, _V1, b"rgba"),
    "abgr": ("ABGR", lambda w, h: 4 * w * h, _V1, b"abgr"),
    "argb": ("ARGB", lambda w, h: 4 * w * h,
             dict(cmpd=[A, R, G, B], sampling=0, interleave=1, pixel_size=4)),
    "bgra": ("BGRA", lambda w, h: 4 * w * h,
             dict(cmpd=[B, G, R, A], sampling=0, interleave=1, pixel_size=4)),
    "rgbx": ("RGBx", lambda w, h: 4 * w * h,
             dict(cmpd=[R, G, B], sampling=0, interleave=1, pixel_size=4)),
    "bgrx": ("BGRx", lambda w, h: 4 * w * h,
             dict(cmpd=[B, G, R], sampling=0, interleave=1, pixel_size=4)),
    "iyu2": ("IYU2", lambda w, h: 3 * w * h,
             dict(cmpd=[CB, Y, CR], sampling=0, interleave=1, pixel_size=3)),
    "v308": ("v308", lambda w, h: 3 * w * h,
             dict(cmpd=[Y, CB, CR], sampling=0, interleave=1, pixel_size=3,
                  profile=b"v308")),
    "ayuv": ("AYUV", lambda w, h: 4 * w * h,
             dict(cmpd=[A, Y, CB, CR], sampling=0, interleave=1,
                  pixel_size=4)),
    "yuy2": ("YUY2", lambda w, h: 2 * w * h,
             dict(cmpd=[Y, CB, Y, CR], sampling=1, interleave=5,
                  pixel_size=4, profile=b"yuv2")),
    "yvyu": ("YVYU", lambda w, h: 2 * w * h,
             dict(cmpd=[Y, CR, Y, CB], sampling=1, interleave=5,
                  pixel_size=4, profile=b"yvyu")),
    "uyvy": ("UYVY", lambda w, h: 2 * w * h,
             dict(cmpd=[CB, Y, CR, Y], sampling=1, interleave=5,
                  pixel_size=4, profile=b"2vuy")),
    "vyuy": ("VYUY", lambda w, h: 2 * w * h,
             dict(cmpd=[CR, Y, CB, Y], sampling=1, interleave=5,
                  pixel_size=4, profile=b"vyuy")),
    "y444": ("Y444", lambda w, h: 3 * w * h,
             dict(cmpd=[Y, CB, CR], sampling=0, interleave=0, pixel_size=0)),
    "i420": ("I420", lambda w, h: 3 * w * h // 2,
             dict(cmpd=[Y, CB, CR], sampling=2, interleave=0, pixel_size=0,
                  profile=b"i420")),
    "yv12": ("YV12", lambda w, h: 3 * w * h // 2,
             dict(cmpd=[Y, CR, CB], sampling=2, interleave=0, pixel_size=0,
                  profile=b"yv20")),
    "y42b": ("Y42B", lambda w, h: 2 * w * h,
             dict(cmpd=[Y, CB, CR], sampling=1, interleave=0, pixel_size=0,
                  profile=b"yu22")),
    "y41b": ("Y41B", lambda w, h: 3 * w * h // 2,
             dict(cmpd=[Y, CB, CR], sampling=3, interleave=0, pixel_size=0)),
    "nv12": ("NV12", lambda w, h: 3 * w * h // 2,
             dict(cmpd=[Y, CB, CR], sampling=2, interleave=2, pixel_size=0,
                  profile=b"nv12")),
    "nv21": ("NV21", lambda w, h: 3 * w * h // 2,
             dict(cmpd=[Y, CR, CB], sampling=2, interleave=2, pixel_size=0,
                  profile=b"nv21")),
    "nv16": ("NV16", lambda w, h: 2 * w * h,
             dict(cmpd=[Y, CB, CR], sampling=1, interleave=2, pixel_size=0)),
    "nv61": ("NV61", lambda w, h: 2 * w * h,
             dict(cmpd=[Y, CR, CB], sampling=1, interleave=2, pixel_size=0)),
    "gbr": ("GBR", lambda w, h: 3 * w * h,
            dict(cmpd=[G, B, R], sampling=0, interleave=0, pixel_size=0)),
    "rgbp": ("RGBP", lambda w, h: 3 * w * h,
             dict(cmpd=[R, G, B], sampling=0, interleave=0, pixel_size=0)),
    "bgrp": ("BGRP", lambda w, h: 3 * w * h,
             dict(cmpd=[B, G, R], sampling=0, interleave=0, pixel_size=0)),
    "gray8": ("GRAY8", lambda w, h: w * h,
              dict(cmpd=[MONO], sampling=0, interleave=0, pixel_size=0)),
    "gray16_be": ("GRAY16_BE", lambda w, h: 2 * w * h,
                  dict(cmpd=[MONO], sampling=0, interleave=0, pixel_size=0,
                       depths=[16])),
    "r210": ("r210", lambda w, h: 4 * w * h,
             dict(cmpd=[R, G, B], sampling=0, interleave=1, pixel_size=4,
                  depths=[10, 10, 10], block=4)),
}


def _check_uncompressed(key):
    fmt, size, expect, *v1profile = UNCOMPRESSED_MATRIX[key]
    w = h = 16
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, size(w, h), np.uint8).tobytes()
              for _ in range(3)]
    data = _mux_one(_video_caps(fmt, w, h), frames)
    types = reader.box_types(data)
    assert types == ["ftyp", "mdat", "moov"]
    entries = _stsd_entries(data)
    assert len(entries) == 1 and entries[0].type == b"uncv"
    facts = _uncc_facts(entries[0])
    if expect == _V1:
        assert facts["version"] == 1
        assert facts["profile"] == v1profile[0]
    else:
        assert facts["version"] == 0
        assert facts["cmpd"] == expect["cmpd"]
        assert facts["sampling"] == expect["sampling"]
        assert facts["interleave"] == expect["interleave"]
        assert facts["pixel_size"] == expect["pixel_size"]
        assert facts["profile"] == expect.get(
            "profile", b"\x00\x00\x00\x00")
        assert facts["depths"] == expect.get("depths", [8] * len(expect["cmpd"]))
        assert facts["block"] == expect.get("block", 0)
        assert facts["row_align"] == 0
    # the payloads round-trip bit-exactly
    tracks = reader.decode_tracks(reader.parse_boxes(data))
    assert reader.extract_samples(data, tracks[0]) == b"".join(frames)


def _make_uncompressed_test(key):
    def test(self):
        _check_uncompressed(key)
    test.__name__ = f"test_encode_uncompressed_{key}"
    test.__doc__ = (f"mp4_tests.rs encode_uncompressed_{key}: uncC facts "
                    "per uncompressed.rs:455-770")
    return test


class TestEncodeUncompressed:
    pass


for _key in UNCOMPRESSED_MATRIX:
    setattr(TestEncodeUncompressed, f"test_encode_uncompressed_{_key}",
            _make_uncompressed_test(_key))


class TestEncodeUncompressedAudio:
    """mp4_tests.rs encode_uncompressed_audio_{s16,s24,s32,f32,f64}:
    ipcm/fpcm sample entries with the pcmC width."""

    @pytest.mark.parametrize("fmt,width,fourcc", [
        ("S16", 16, b"ipcm"), ("S24LE", 24, b"ipcm"), ("S32", 32, b"ipcm"),
        ("F32", 32, b"fpcm"), ("F64", 64, b"fpcm")])
    def test_encode_uncompressed_audio(self, fmt, width, fourcc):
        rate, ch, frames_n = 44100, 2, 441
        bpf = width // 8 * ch
        rng = np.random.default_rng(2)
        dtypes = {"S16": np.int16, "S32": np.int32, "F32": np.float32,
                  "F64": np.float64}
        if fmt == "S24LE":  # 3-byte packed samples ride as raw bytes
            arr = rng.integers(0, 256, frames_n * bpf, np.uint8)
        else:
            arr = rng.integers(0, 100, (frames_n, ch)).astype(dtypes[fmt])
        payload = arr.tobytes()
        caps = Caps.builder("audio/x-raw", format=fmt, rate=rate, channels=ch,
                            layout="interleaved")
        data = _mux_one_audio(caps, arr, dur=frames_n * S // rate)
        entries = _stsd_entries(data)
        assert entries[0].type == fourcc
        pcmc = reader.parse_boxes(
            entries[0].payload, 28, len(entries[0].payload))[0]
        assert pcmc.type == b"pcmC"
        assert pcmc.payload[5] == width
        tracks = reader.decode_tracks(reader.parse_boxes(data))
        assert tracks[0].timescale == rate
        assert sum(tracks[0].sample_durations) == frames_n
        assert reader.extract_samples(data, tracks[0]) == payload


class TestCodecMuxBoxes:
    """test_{flac,ac3,eac3}_mux_boxes: codec sample entries in the
    non-fragmented moov (the fragmented twins live in
    test_fmp4_scenarios.TestFmuxBoxes)."""

    def test_ac3_mux_boxes(self):
        from test_fmp4_scenarios import TestFmuxBoxes
        frame = TestFmuxBoxes._ac3_frame()
        caps = Caps.builder("audio/x-ac3", framed=True, rate=48000,
                            channels=2)
        data = _mux_one(caps, [frame] * 5, dur=1536 * S // 48000)
        entries = _stsd_entries(data)
        assert entries[0].type == b"ac-3"
        assert b"dac3" in entries[0].payload

    def test_eac3_mux_boxes(self):
        from test_fmp4_scenarios import TestFmuxBoxes
        frame = TestFmuxBoxes._eac3_frame()
        caps = Caps.builder("audio/x-eac3", framed=True, rate=48000,
                            channels=2)
        data = _mux_one(caps, [frame] * 5, dur=6 * 256 * S // 48000)
        entries = _stsd_entries(data)
        assert entries[0].type == b"ec-3"
        assert b"dec3" in entries[0].payload

    def test_flac_mux_boxes(self):
        from test_fmp4_scenarios import TestFmuxBoxes
        info = TestFmuxBoxes._flac_streaminfo()
        caps = Caps.builder("audio/x-flac", framed=True, rate=44100,
                            channels=2, codec_data=info)
        data = _mux_one(caps, [b"\xff\xf8" + bytes(62)] * 5,
                        dur=1024 * S // 44100)
        entries = _stsd_entries(data)
        assert entries[0].type == b"fLaC"
        assert b"dfLa" in entries[0].payload


class TestCapsChange:
    """test_caps_change_with_{h264,h265,vp8,vp9} (mp4_tests.rs:1436-1543):
    resolution changes every 10 buffers become ADDITIONAL stsd entries with
    stsc switching sample_description_index (codecs_len=4 in the
    reference's ExpectedConfiguration).  The reference produces the streams
    with real encoders; here caps-configured AUs drive the identical stsd/
    stsc machinery."""

    RESOLUTIONS = [(320, 240), (640, 480), (1080, 720), (1920, 1080)]

    def _caps(self, media, w, h, n):
        extra = {"width": w, "height": h}
        if media == "video/x-h264":
            extra.update({"stream-format": "avc",
                          "codec_data": bytes([1, n, 3, 4])})
        elif media == "video/x-h265":
            extra.update({"stream-format": "hvc1",
                          "codec_data": bytes([1, n, 3, 4])})
        elif media == "video/x-vp9":
            extra.update({"codec_data": bytes([n])})
        return Caps.builder(media, **extra)

    def _run(self, media):
        mux = fx.element_factory_make("isomp4mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(mux); p.add(sink)
        pad = mux.request_sink_pad()
        mux.pad("src").link(sink.pad("sink"))
        p.set_state(State.PLAYING)
        pad.send_event(Event.new_stream_start("s0"))
        pad.send_event(Event.new_caps(self._caps(media, 320, 240, 0)))
        pad.send_event(Event.new_segment(Segment()))
        dur = S // 10
        rng = np.random.default_rng(3)
        payloads = []
        for i in range(40):
            if i and i % 10 == 0:
                w, h = self.RESOLUTIONS[i // 10]
                pad.send_event(Event.new_caps(
                    self._caps(media, w, h, i // 10)))
            payload = rng.integers(0, 256, 32, np.uint8).tobytes()
            payloads.append(payload)
            pad.chain(Buffer(np.frombuffer(payload, np.uint8), pts=i * dur,
                             duration=dur))
        pad.send_event(Event.new_eos())
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in sink.samples)
        entries = _stsd_entries(data)
        assert len(entries) == 4  # codecs_len = 4
        # stsc switches the description index per resolution run
        tree = reader.parse_boxes(data)
        moov = next(n for n in tree if n.type == b"moov")
        stsc = moov.find(b"trak", b"mdia", b"minf", b"stbl", b"stsc")
        n_ent = struct.unpack(">I", stsc.payload[4:8])[0]
        descs = [struct.unpack(
            ">III", stsc.payload[8 + 12 * i:20 + 12 * i])[2]
            for i in range(n_ent)]
        seen = []
        for d in descs:
            if not seen or seen[-1] != d:
                seen.append(d)
        assert seen == [1, 2, 3, 4]
        # every payload survives, in order
        tracks = reader.decode_tracks(tree)
        assert reader.extract_samples(data, tracks[0]) == b"".join(payloads)

    def test_caps_change_with_h264(self):
        self._run("video/x-h264")

    def test_caps_change_with_h265(self):
        self._run("video/x-h265")

    def test_caps_change_with_vp9(self):
        self._run("video/x-vp9")

    def test_caps_change_with_vp8(self):
        """The reference's vp8 variant (vp8 has no codec_data; the entry
        differs by resolution only)."""
        media = "video/x-vp8"
        caps0 = Caps.builder(media, width=320, height=240)
        mux = fx.element_factory_make("isomp4mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(mux); p.add(sink)
        pad = mux.request_sink_pad()
        mux.pad("src").link(sink.pad("sink"))
        p.set_state(State.PLAYING)
        pad.send_event(Event.new_stream_start("s0"))
        pad.send_event(Event.new_caps(caps0))
        pad.send_event(Event.new_segment(Segment()))
        dur = S // 10
        for i in range(20):
            if i == 10:
                pad.send_event(Event.new_caps(
                    Caps.builder(media, width=640, height=480)))
            pad.chain(Buffer(np.zeros(16, np.uint8), pts=i * dur,
                             duration=dur))
        pad.send_event(Event.new_eos())
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in sink.samples)
        assert len(_stsd_entries(data)) == 2


class TestCompressedRaw:
    """encode_compressed_raw_* / roundtrip_compressed_raw_*
    (mp4_tests.rs:1900-2087): generically-compressed uncompressed video —
    'resv' restricted sample entries carrying rinf{frma 'uncv' + schm
    'gcmp' + schi{cmpC <fourcc>}} next to the cmpd/uncC of the inner raw
    format, produced by the real compress elements upstream."""

    CASES = {
        "rgb_zlib": ("RGB", "zlibcompress", "zlibdecompress", b"zlib"),
        "nv12_zlib": ("NV12", "zlibcompress", "zlibdecompress", b"zlib"),
        "i420_zlib": ("I420", "zlibcompress", "zlibdecompress", b"zlib"),
        "rgb_deflate": ("RGB", "deflatecompress", "deflatedecompress",
                        b"defl"),
        "rgb_brotli": ("RGB", "brotlicompress", "brotlidecompress",
                       b"brot"),
    }

    def _encode(self, fmt, enc_name):
        w = h = 16
        size = {"RGB": 3 * w * h, "NV12": 3 * w * h // 2,
                "I420": 3 * w * h // 2}[fmt]
        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 200, size, np.uint8).tobytes()
                  for _ in range(3)]
        enc = fx.element_factory_make(enc_name)
        mux = fx.element_factory_make("isomp4mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (enc, mux, sink):
            p.add(e)
        pad = mux.request_sink_pad()
        enc.pad("src").link(pad)
        mux.pad("src").link(sink.pad("sink"))
        p.set_state(State.PLAYING)
        src = Pad("t-src", PadDirection.SRC)
        src.link(enc.pad("sink"))
        src.push_event(Event.new_stream_start("s0"))
        src.push_event(Event.new_caps(_video_caps(fmt, w, h)))
        src.push_event(Event.new_segment(Segment()))
        dur = S // 10
        for i, f in enumerate(frames):
            src.push(Buffer(np.frombuffer(f, np.uint8), pts=i * dur,
                            duration=dur))
        src.push_event(Event.new_eos())
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in sink.samples)
        return data, frames

    def _check_encode(self, case):
        fmt, enc, _dec, fourcc = self.CASES[case]
        data, _frames = self._encode(fmt, enc)
        entries = _stsd_entries(data)
        assert entries[0].type == b"resv"
        facts = _uncc_facts(entries[0])
        assert facts["frma"] == b"uncv"
        assert facts["schm"] == b"gcmp"
        assert facts["cmpC"] == fourcc
        # the inner uncC still describes the raw format
        if fmt == "RGB":
            assert facts["version"] == 1 and facts["profile"] == b"rgb3"
        else:
            assert facts["sampling"] == 2 and facts["interleave"] in (0, 2)
        return data

    def _check_roundtrip(self, case):
        fmt, enc, dec_name, _fourcc = self.CASES[case]
        data, frames = self._encode(fmt, enc)
        tracks = reader.decode_tracks(reader.parse_boxes(data))
        blob = reader.extract_samples(data, tracks[0])
        # per-sample decompression (cmpC compressed_unit_type=0)
        sizes = tracks[0].sample_sizes
        dec = fx.element_factory_make(dec_name)
        from gst_plugins_rs_tpu.core import Harness
        h = Harness(dec)
        h.set_src_caps(Caps.builder("application/octet-stream"))
        off = 0
        out = []
        for sz in sizes:
            h.push(Buffer(np.frombuffer(blob[off:off + sz], np.uint8)))
            out.append(np.asarray(h.pull().data).tobytes())
            off += sz
        assert out == frames

    def test_encode_compressed_raw_rgb_zlib(self):
        self._check_encode("rgb_zlib")

    def test_encode_compressed_raw_nv12_zlib(self):
        self._check_encode("nv12_zlib")

    def test_encode_compressed_raw_i420_zlib(self):
        self._check_encode("i420_zlib")

    def test_encode_compressed_raw_rgb_deflate(self):
        self._check_encode("rgb_deflate")

    def test_encode_compressed_raw_rgb_brotli(self):
        self._check_encode("rgb_brotli")

    def test_roundtrip_compressed_raw_rgb_zlib(self):
        self._check_roundtrip("rgb_zlib")

    def test_roundtrip_compressed_raw_nv12_zlib(self):
        self._check_roundtrip("nv12_zlib")

    def test_roundtrip_compressed_raw_i420_zlib(self):
        self._check_roundtrip("i420_zlib")

    def test_roundtrip_compressed_raw_rgb_deflate(self):
        self._check_roundtrip("rgb_deflate")

    def test_roundtrip_compressed_raw_rgb_brotli(self):
        self._check_roundtrip("rgb_brotli")


class TestImageSequence:
    """encode_uncompressed_image_sequence_{rgb,nv12} (mp4_tests.rs): the
    image-sequence pad property writes the track with the ISO/IEC 23008-12
    'pict' handler instead of 'vide'."""

    def _run(self, fmt, size):
        mux = fx.element_factory_make("isomp4mux")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(mux); p.add(sink)
        pad = mux.request_sink_pad()
        pad.set_property("image-sequence", True)
        mux.pad("src").link(sink.pad("sink"))
        p.set_state(State.PLAYING)
        pad.send_event(Event.new_stream_start("s0"))
        pad.send_event(Event.new_caps(_video_caps(fmt)))
        pad.send_event(Event.new_segment(Segment()))
        rng = np.random.default_rng(5)
        for i in range(3):
            pad.chain(Buffer(rng.integers(0, 256, size, np.uint8),
                             pts=i * S, duration=S))
        pad.send_event(Event.new_eos())
        data = b"".join(np.asarray(s.buffer.data).tobytes()
                        for s in sink.samples)
        tree = reader.parse_boxes(data)
        moov = next(n for n in tree if n.type == b"moov")
        hdlr = moov.find(b"trak", b"mdia", b"hdlr")
        assert hdlr.payload[8:12] == b"pict"  # ver/flags + pre_defined
        entries = _stsd_entries(data)
        assert entries[0].type == b"uncv"

    def test_encode_uncompressed_image_sequence_rgb(self):
        self._run("RGB", 16 * 16 * 3)

    def test_encode_uncompressed_image_sequence_nv12(self):
        self._run("NV12", 16 * 16 * 3 // 2)
