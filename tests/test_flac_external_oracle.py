"""FLAC codec validated against the SYSTEM libavcodec — an external oracle.

tests/test_flac.py asserts the from-spec codec (codecs/flac.py) against
in-repo vectors: encoder and decoder were written by the same hand, so a
shared misreading of the FLAC spec would be invisible there.  These tests
cross the boundary both ways:

  * our encoder's bytes -> ffmpeg's FLAC decoder (CRC-validated there),
  * ffmpeg's FLAC encoder -> our decoder,

and demand bit-exact PCM round-trips.  This matches the confidence the
reference's claxondec gets from claxon's own corpus of ffmpeg-produced
files (audio/claxon/src/claxondec/imp.rs decodes real-world FLAC).

Skipped when the native avshim can't build (no system ffmpeg libs).
"""
import numpy as np
import pytest

from gst_plugins_rs_tpu.codecs import avlib, flac

pytestmark = pytest.mark.skipif(
    not avlib.available(), reason="system libavcodec shim unavailable")


def _pcm16(n: int, channels: int, seed: int = 7) -> np.ndarray:
    """Deterministic int16 test signal: sines + noise + silence + full-scale."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    out = np.zeros((n, channels), np.int64)
    for c in range(channels):
        tone = 0.45 * np.sin(2 * np.pi * (220.0 + 130.0 * c) * t / 44100.0)
        noise = 0.05 * rng.standard_normal(n)
        out[:, c] = np.clip((tone + noise) * 32767.0, -32768, 32767).astype(np.int64)
    out[: n // 16] = 0                       # constant subframe territory
    out[-4:] = [[32767] * channels, [-32768] * channels][0]  # clamp edges
    return out


def _frames(data: bytes):
    """Split a fLaC stream into (streaminfo, [frame bytes]) using the in-repo
    parser for BOUNDARIES only — libav independently validates each frame's
    sync code, header CRC-8, payload, and footer CRC-16."""
    info, pos = flac.parse_header(data)
    si = None
    # re-scan metadata blocks to grab the raw 34-byte STREAMINFO for extradata
    p = 4
    while True:
        hdr = data[p]
        size = int.from_bytes(data[p + 1 : p + 4], "big")
        if hdr & 0x7F == 0:
            si = data[p + 4 : p + 4 + 34]
        p += 4 + size
        if hdr & 0x80:
            break
    out = []
    while pos < len(data):
        _, nxt = flac.decode_frame(data, pos, info)
        out.append(data[pos:nxt])
        pos = nxt
    return info, si, out


@pytest.mark.parametrize("mode,stereo", [
    ("fixed", "independent"),
    ("fixed", "left-side"),
    ("fixed", "mid-side"),
    ("verbatim", "independent"),
])
def test_our_encoder_decodes_bit_exactly_in_libav(mode, stereo):
    pcm = _pcm16(9000, 2)  # 3 frames at block_size=4096 (last one short)
    data = flac.encode(pcm, rate=44100, bps=16, mode=mode, stereo_mode=stereo)
    info, si, frames = _frames(data)
    assert si is not None and len(si) == 34
    dec = avlib.AudioDecoder("flac", extradata=si)
    got = []
    for fr in frames:
        for samples, rate, _ in dec.decode(fr):
            assert rate == 44100
            got.append(samples)
    for samples, _, _ in dec.decode(None):
        got.append(samples)
    out = np.concatenate(got, axis=0)
    assert out.shape == (9000, 2)
    # shim returns f32 = s16/32768; undo exactly
    back = np.rint(out * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(back, pcm)


def test_libav_encoder_decodes_bit_exactly_in_ours():
    enc = avlib.AudioEncoder("flac", 44100, 2)
    n = enc.frame_size * 3 + 123  # force a short final frame
    pcm = _pcm16(n, 2, seed=11)
    f32 = (pcm / 32768.0).astype(np.float32)  # exact: |pcm| <= 2^15, /2^15
    packets = []
    for start in range(0, n, enc.frame_size):
        packets += enc.encode(f32[start : start + enc.frame_size], pts=start)
    packets += enc.encode(None)
    extradata = enc.extradata
    assert len(extradata) >= 34
    # libav's FLAC extradata is the raw 34-byte STREAMINFO; wrap it into a
    # well-formed fLaC stream for the in-repo full-stream decoder
    si = extradata[-34:]
    stream = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si
    stream += b"".join(p for p, _ in packets)
    info, out = flac.decode(stream)
    assert info.rate == 44100 and info.channels == 2
    assert out.shape[0] >= n
    np.testing.assert_array_equal(out[:n].astype(np.int64), pcm)


def test_libav_encoder_decodes_in_ours_mono():
    enc = avlib.AudioEncoder("flac", 48000, 1)
    n = enc.frame_size * 2
    pcm = _pcm16(n, 1, seed=3)
    f32 = (pcm / 32768.0).astype(np.float32)
    packets = []
    for start in range(0, n, enc.frame_size):
        packets += enc.encode(f32[start : start + enc.frame_size], pts=start)
    packets += enc.encode(None)
    si = enc.extradata[-34:]
    stream = (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si
              + b"".join(p for p, _ in packets))
    info, out = flac.decode(stream)
    assert info.channels == 1
    np.testing.assert_array_equal(out[:n].astype(np.int64), pcm)
