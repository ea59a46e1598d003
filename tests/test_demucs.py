"""demucs element tests: stem pad layout, segmented inference contracts,
weights save/load round trip, htdemucs gating."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.models import demucs as dm


class TestModel:
    def test_output_shape_and_length(self):
        cfg = dm.DemucsConfig(channels=8, depth=3, lstm_layers=1)
        params = dm.init_params(cfg)
        apply = dm.make_apply(cfg)
        T = cfg.valid_length(2000)
        out = apply(params, np.zeros((1, T, 2), np.float32))
        assert out.shape == (1, 4, T, 2)

    def test_weights_roundtrip(self, tmp_path):
        cfg = dm.DemucsConfig(channels=8, depth=2, lstm_layers=1)
        params = dm.init_params(cfg, seed=3)
        path = str(tmp_path / "w.npz")
        dm.save_npz(path, params)
        loaded = dm.load_npz(path, cfg)
        import jax

        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            assert (np.asarray(a) == np.asarray(b)).all()

    def test_shape_mismatch_rejected(self, tmp_path):
        cfg = dm.DemucsConfig(channels=8, depth=2, lstm_layers=1)
        dm.save_npz(str(tmp_path / "w.npz"), dm.init_params(cfg))
        other = dm.DemucsConfig(channels=16, depth=2, lstm_layers=1)
        with pytest.raises((ValueError, KeyError)):
            dm.load_npz(str(tmp_path / "w.npz"), other)


class TestElement:
    def _pipeline(self, num_buffers=10):
        p = fx.Pipeline()
        src = fx.element_factory_make("audiotestsrc")
        src.set_property("wave", "sine")
        src.set_property("num-buffers", num_buffers)
        src.set_property("samplesperbuffer", 4800)
        caps = fx.element_factory_make("capsfilter")
        caps.set_property("caps", parse_caps("audio/x-raw,format=F32,rate=48000,channels=2"))
        d = fx.element_factory_make("demucs")
        d.set_property("segment-duration", 200_000_000)  # 0.2 s segments
        sinks = {}
        for e in (src, caps, d):
            p.add(e)
        src.link(caps)
        caps.pad("src").link(d.pad("sink"))
        for stem in ("drums", "bass", "other", "vocals"):
            s = fx.element_factory_make("appsink", stem)
            p.add(s)
            d.pad(f"src_{stem}").link(s.pad("sink"))
            sinks[stem] = s
        return p, sinks

    def test_four_stems_sample_counts(self):
        p, sinks = self._pipeline(num_buffers=5)  # 0.5 s total
        p.play_until_eos()
        for stem, s in sinks.items():
            out = s.concat_audio()
            assert out.shape == (24000, 2), stem
            assert s.caps.structure(0)["channels"] == 2
        # pts bookkeeping: last buffer ends exactly at stream end
        last = sinks["vocals"].samples[-1].buffer
        assert last.pts + last.duration == 500_000_000

    def test_htdemucs_gated(self):
        d = fx.element_factory_make("demucs")
        d.set_property("model-name", "htdemucs")
        with pytest.raises(RuntimeError, match="htdemucs"):
            d.set_state(fx.State.PAUSED)
