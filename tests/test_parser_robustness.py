"""Fuzz-style robustness: byte parsers fail with ValueError, never crash.

The reference's parsers get this guarantee from Rust's typed errors plus
the GStreamer ecosystem's oss-fuzz coverage; here the contract is pinned
directly: every parser that consumes untrusted bytes (network packets,
container files, codec streams) must raise ValueError — the one documented
error — on malformed input, not leak IndexError/struct.error/KeyError/
StopIteration (the last of which silently terminates surrounding
generators).  Inputs: random blobs, truncations of a valid seed, and
single-byte corruptions (deterministic rng).
"""
import numpy as np
import pytest

from gst_plugins_rs_tpu.codecs import brotli, flac
from gst_plugins_rs_tpu.mux import mpegts, reader
from gst_plugins_rs_tpu.net import rtcp, rtp, sdp, stun


def _cases(seed: bytes, rng):
    out = []
    for n in (0, 1, 5, 20, 100, 400):
        for _ in range(10):
            out.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    for cut in range(0, min(len(seed), 80), 3):
        out.append(seed[:cut])
    s = bytearray(seed)
    for _ in range(120):
        i = int(rng.integers(0, len(s)))
        orig = s[i]
        s[i] = int(rng.integers(0, 256))
        out.append(bytes(s))
        s[i] = orig
    return out


def _assert_graceful(fn, seed: bytes):
    rng = np.random.default_rng(0)
    for case in _cases(seed, rng):
        try:
            fn(case)
        except ValueError:
            pass  # the documented failure mode
        # anything else (IndexError, struct.error, StopIteration, ...)
        # propagates and fails the test with the real traceback


@pytest.fixture(scope="module")
def flac_seed():
    rng = np.random.default_rng(1)
    pcm = rng.integers(-1000, 1000, (600, 2)).astype(np.int64)
    return flac.encode(pcm, rate=8000, block_size=256)


@pytest.fixture(scope="module")
def mp4_seed():
    import gst_plugins_rs_tpu as fx

    p = fx.parse_launch(
        "audiotestsrc num-buffers=3 samplesperbuffer=1024 "
        "! audio/x-raw,format=F32,rate=48000,channels=2 "
        "! isomp4mux ! appsink name=sink")
    p.play_until_eos()
    return b"".join(np.asarray(s.buffer.data).tobytes()
                    for s in p.by_name("sink").samples)


def test_flac_header_and_decode_graceful(flac_seed):
    _assert_graceful(flac.parse_header, flac_seed)
    _assert_graceful(lambda b: flac.decode(b, native=False), flac_seed)
    _assert_graceful(lambda b: flac.decode(b, native=True), flac_seed)


def test_mp4_reader_graceful(mp4_seed):
    _assert_graceful(lambda b: reader.decode_tracks(reader.parse_boxes(b)),
                     mp4_seed)
    _assert_graceful(lambda b: reader.movie_timescale(reader.parse_boxes(b)),
                     mp4_seed)
    _assert_graceful(lambda b: reader.decode_fragments(b), mp4_seed)


def test_rtp_rtcp_graceful():
    rtp_seed = rtp.RtpPacket(96, 1, 0, 0x1234, b"x" * 20).to_bytes()
    _assert_graceful(rtp.RtpPacket.parse, rtp_seed)
    sr = b"\x80\xc8\x00\x06" + bytes(24)
    _assert_graceful(rtcp.parse_compound, sr)


def test_stun_graceful():
    seed = stun.StunMessage(0x0001, b"\x01" * 12, []).encode()
    _assert_graceful(stun.StunMessage.decode, seed)


def test_sdp_graceful():
    seed = (b"v=0\r\no=- 1 1 IN IP4 0.0.0.0\r\ns=x\r\n"
            b"m=audio 0 RTP/AVP 96\r\na=rtpmap:96 opus/48000/2\r\n"
            b"a=fmtp:96 sprop=1;x=2\r\n")
    _assert_graceful(lambda b: sdp.parse_sdp(b.decode("latin1")), seed)


def test_mpegts_and_brotli_graceful():
    seed = mpegts.build_pat() + mpegts.build_pmt([(0x0F, 0x101)])
    _assert_graceful(lambda b: list(mpegts.iter_packets(b)), seed)
    _assert_graceful(brotli.decompress, b"\x0b\x00\x80hello\x03")
