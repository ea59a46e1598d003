"""FLAC codec + claxondec tests.

The decoder is validated against the in-repo encoder across every subframe
type / channel assignment, against hand-corrupted streams (CRC rejection),
and for streaming delivery through the element.
"""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.codecs import flac
from gst_plugins_rs_tpu.core.parse import parse_caps


def sine_pcm(n=9000, channels=2, amp=12000):
    t = np.arange(n)
    chans = [(np.sin(t * (0.01 + 0.003 * c) + c) * amp).astype(np.int64)
             for c in range(channels)]
    return np.stack(chans, axis=1)


class TestCodec:
    @pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed", "lpc"])
    def test_roundtrip_modes(self, mode):
        pcm = (np.full((5000, 2), -123, np.int64) if mode == "constant"
               else sine_pcm(5000))
        enc = flac.encode(pcm, rate=48000, bps=16, block_size=2048, mode=mode)
        info, out = flac.decode(enc)
        assert info.rate == 48000 and info.channels == 2 and info.bps == 16
        assert (out == pcm).all()

    @pytest.mark.parametrize("stereo", ["left-side", "mid-side"])
    def test_stereo_decorrelation(self, stereo):
        pcm = sine_pcm(4000)
        enc = flac.encode(pcm, mode="fixed", stereo_mode=stereo)
        _, out = flac.decode(enc)
        assert (out == pcm).all()

    def test_odd_block_and_24bit(self):
        pcm = (sine_pcm(3333, 1) * 200).clip(-(1 << 23), (1 << 23) - 1)
        enc = flac.encode(pcm, bps=24, block_size=1000, mode="fixed")
        info, out = flac.decode(enc)
        assert info.bps == 24
        assert (out == pcm).all()

    def test_random_noise(self):
        rng = np.random.default_rng(11)
        pcm = rng.integers(-32768, 32767, (7000, 2), dtype=np.int64)
        enc = flac.encode(pcm, mode="fixed", block_size=4096)
        _, out = flac.decode(enc)
        assert (out == pcm).all()

    def test_fixed_compresses_sine(self):
        pcm = sine_pcm(8192)
        enc = flac.encode(pcm, mode="fixed")
        assert len(enc) < 0.5 * pcm.size * 2  # > 2x on smooth signals

    def test_crc_rejection(self):
        enc = bytearray(flac.encode(sine_pcm(2000), mode="fixed"))
        enc[-10] ^= 0x01  # corrupt frame payload
        with pytest.raises(ValueError):
            flac.decode(bytes(enc))

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            flac.decode(b"OggS" + b"\x00" * 100)

    def test_utf8_frame_numbers(self):
        # > 127 frames forces multi-byte UTF-8 frame numbers
        pcm = sine_pcm(200 * 192, 1)
        enc = flac.encode(pcm, block_size=192, mode="fixed")
        _, out = flac.decode(enc)
        assert (out == pcm).all()


class TestClaxonDec:
    def _run(self, enc, chunk=997):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("audio/x-flac"))
        dec = fx.element_factory_make("claxondec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, dec, sink):
            p.add(e)
        src.link(dec); dec.link(sink)
        for i in range(0, len(enc), chunk):
            src.push_buffer(fx.Buffer(np.frombuffer(enc[i:i + chunk], np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        return sink

    def test_element_streaming_decode(self):
        pcm = sine_pcm(9000)
        enc = flac.encode(pcm, rate=44100, bps=16, block_size=2048, mode="fixed")
        sink = self._run(enc)
        out = sink.concat_audio()
        assert out.dtype == np.int16
        assert (out == pcm).all()
        s = sink.caps.structure(0)
        assert s["format"] == "S16" and s["rate"] == 44100 and s["channels"] == 2

    def test_element_24bit_s32(self):
        pcm = (sine_pcm(4000, 1) * 100).clip(-(1 << 23), (1 << 23) - 1)
        enc = flac.encode(pcm, bps=24, block_size=1024, mode="fixed")
        sink = self._run(enc)
        out = sink.concat_audio()
        assert out.dtype == np.int32
        assert (out == pcm).all()
        assert sink.caps.structure(0)["format"] == "S32"

    def test_pts_progression(self):
        pcm = sine_pcm(8192, 1)
        enc = flac.encode(pcm, rate=8192, block_size=2048, mode="fixed")
        sink = self._run(enc, chunk=64)  # tiny chunks -> incremental decode
        assert len(sink.samples) >= 2
        total = sum(s.buffer.n_frames for s in sink.samples)
        assert total == 8192
        # pts in sample-exact seconds at rate 8192
        for s in sink.samples:
            assert s.buffer.pts is not None
        assert sink.samples[-1].buffer.pts + sink.samples[-1].buffer.duration == 1_000_000_000


class TestNativeDecoder:
    def test_native_matches_python(self):
        pcm = sine_pcm(12000)
        for mode in ("constant", "verbatim", "fixed", "lpc"):
            data = (np.full((12000, 2), 7, np.int64) if mode == "constant" else pcm)
            enc = flac.encode(data, block_size=4096, mode=mode)
            _, py = flac.decode(enc, native=False)
            _, nat = flac.decode(enc, native=True)
            assert (py == nat).all(), mode

    def test_native_stereo_assignments(self):
        pcm = sine_pcm(6000)
        for stereo in ("left-side", "mid-side"):
            enc = flac.encode(pcm, mode="fixed", stereo_mode=stereo)
            _, py = flac.decode(enc, native=False)
            _, nat = flac.decode(enc, native=True)
            assert (py == nat).all(), stereo

    def test_native_rejects_corruption(self):
        if flac._native() is None:
            pytest.skip("native decoder not built")
        enc = bytearray(flac.encode(sine_pcm(4000), mode="fixed"))
        enc[-10] ^= 1
        with pytest.raises(ValueError):
            flac.decode(bytes(enc), native=True)

    def test_native_is_fast(self):
        import time

        if flac._native() is None:
            pytest.skip("native decoder not built")
        pcm = sine_pcm(44100 * 2)
        enc = flac.encode(pcm, rate=44100, mode="fixed")
        t0 = time.perf_counter()
        flac.decode(enc, native=True)
        dt = time.perf_counter() - t0
        assert 2.0 / dt > 50  # >50x realtime (measured ~450x)
