"""whispertranscriber: gating and architecture wiring (random weights)."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


class TestWhisper:
    def test_requires_model_or_optin(self):
        el = fx.element_factory_make("whispertranscriber")
        with pytest.raises(RuntimeError, match="model-path"):
            el.set_state(fx.State.PAUSED)

    def test_random_weights_pipeline(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=4 samplesperbuffer=8000 "
            "! audio/x-raw,format=F32,rate=16000,channels=1 "
            "! whispertranscriber allow-random-weights=true "
            "chunk-duration=1000000000 max-new-tokens=4 "
            "! appsink name=sink"
        )
        p.play_until_eos()
        sink = p.by_name("sink")
        texts = [str(s.buffer.data) for s in sink.samples]
        assert len(texts) == 2  # 2 s of audio in 1 s chunks
        assert all(t for t in texts)  # token ids as text (random weights)
        # pts bookkeeping: chunks span the stream
        assert [s.buffer.pts for s in sink.samples] == [0, 1_000_000_000]
        assert sink.caps.structure(0).name == "text/x-raw"


class TestTranscriberBin:
    def test_captions_appear_on_video(self):
        bin_ = fx.element_factory_make("transcriberbin")
        bin_.set_property("transcriber::allow-random-weights", True)
        bin_.set_property("transcriber::chunk-duration", 1_000_000_000)
        bin_.set_property("transcriber::max-new-tokens", 3)
        asrc = fx.element_factory_make("audiotestsrc")
        asrc.set_property("wave", "sine"); asrc.set_property("num-buffers", 4)
        asrc.set_property("samplesperbuffer", 8000)
        acaps = fx.element_factory_make("capsfilter")
        acaps.set_property("caps", parse_caps("audio/x-raw,format=F32,rate=16000,channels=1"))
        vsrc = fx.element_factory_make("videotestsrc")
        vsrc.set_property("pattern", "white"); vsrc.set_property("num-buffers", 6)
        vcaps = fx.element_factory_make("capsfilter")
        vcaps.set_property("caps", parse_caps("video/x-raw,format=RGB,width=320,height=180,framerate=3/1"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (bin_, asrc, acaps, vsrc, vcaps, sink):
            p.add(e)
        asrc.link(acaps)
        acaps.pad("src").link(bin_.pad("sink_audio"))
        vsrc.link(vcaps)
        vcaps.pad("src").link(bin_.pad("sink_video"))
        bin_.pad("src").link(sink.pad("sink"))
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data) for s in sink.samples]
        assert len(frames) == 6
        # the last frames carry the (random-token) caption box dimming pixels
        assert (frames[-1] < 250).any()
