"""loudnormbank: element-layer multi-stream loudness normalization.

The element drives parallel/streams.loudnorm_bank through REAL pads/
events/PTS — N audiotestsrc streams in one Pipeline, one vmapped device
dispatch per aligned 100 ms tick, optionally with the stream axis sharded
over the 8-device virtual mesh (tests/conftest.py).  Oracle: independent
R-128 re-measurement of every output stream (the reference's
audioloudnorm test oracle, audio/audiofx/tests/audioloudnorm.rs:109-171),
plus shard/unshard bit-parity.
"""
import numpy as np

import jax
import jax.numpy as jnp

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import element_factory_make
from gst_plugins_rs_tpu.ops import loudnorm as LN


def measured_lufs(samples: np.ndarray, channels: int) -> float:
    from gst_plugins_rs_tpu.core.audio import default_channel_positions
    from gst_plugins_rs_tpu.ops.ebur128 import (
        loudness_global, r128_add_full_subblocks, r128_init, r128_params)

    params = r128_params(LN.RATE, default_channel_positions(channels),
                         jnp.float32)
    state = r128_init(params, channels, jnp.float32)
    n100 = LN.RATE // 10
    n = samples.shape[0] // n100 * n100
    state = r128_add_full_subblocks(state, params,
                                    jnp.asarray(samples[:n], jnp.float32))
    return float(loudness_global(state, params))


def run_bank(n_streams: int, shard: bool, volumes):
    p = fx.Pipeline()
    bank = element_factory_make("loudnormbank")
    bank.set_property("shard", shard)
    p.add(bank)
    sinks = []
    # 3 s first frame + 4 inner frames = 3.4 s per stream
    nbuf = 34
    for i in range(n_streams):
        src = element_factory_make("audiotestsrc")
        src.set_property("wave", "sine")
        src.set_property("freq", 440.0 + 100 * i)
        src.set_property("volume", volumes[i])
        src.set_property("samplesperbuffer", LN.RATE // 10)
        src.set_property("num-buffers", nbuf)
        sink = element_factory_make("appsink")
        p.add(src)
        p.add(sink)
        # force 192 kHz mono negotiation via a capsfilter
        cf = element_factory_make("capsfilter")
        from gst_plugins_rs_tpu.core.parse import parse_caps

        cf.set_property("caps", parse_caps(
            f"audio/x-raw,format=F32,rate={LN.RATE},channels=1"))
        p.add(cf)
        src.link(cf)
        cf.pad("src").link(bank.request_sink_pad())
        bank.pad(f"src_{i}").link(sink.pad("sink"))
        sinks.append(sink)
    p.play_until_eos()
    return [s.concat_audio() for s in sinks]


class TestLoudnormBank:
    def test_pipeline_normalizes_all_streams(self):
        vols = [0.8, 0.25, 0.5, 0.1]
        outs = run_bank(4, shard=False, volumes=vols)
        for i, out in enumerate(outs):
            assert out.shape[0] >= 3 * LN.RATE, f"stream {i} too short"
            lufs = measured_lufs(np.asarray(out), 1)
            assert abs(lufs + 24.0) < 1.0, \
                f"stream {i} (vol {vols[i]}): {lufs:.2f} LUFS"

    def test_sharded_mesh_matches_unsharded(self):
        """The same pipeline with the stream axis sharded over the 8-device
        mesh (SURVEY §2.3 'shard streams across TPU mesh' at the ELEMENT
        layer) produces identical samples."""
        assert len(jax.devices()) >= 8, "conftest must provide the 8-CPU mesh"
        vols = [0.8, 0.25, 0.5, 0.1, 0.9, 0.3, 0.6, 0.45]
        plain = run_bank(8, shard=False, volumes=vols)
        sharded = run_bank(8, shard=True, volumes=vols)
        for i, (a, b) in enumerate(zip(plain, sharded)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6,
                err_msg=f"stream {i}")
        lufs = measured_lufs(np.asarray(sharded[1]), 1)
        assert abs(lufs + 24.0) < 1.0

    def test_sample_count_conservation(self):
        outs = run_bank(2, shard=False, volumes=[0.7, 0.2])
        n_in = 34 * (LN.RATE // 10)
        for out in outs:
            # first(100ms) + inners + drain: everything in, everything out
            assert out.shape[0] == n_in
