"""whispertranscriber: gating and architecture wiring (random weights)."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


class TestWhisper:
    def test_no_model_path_uses_builtin_or_errors(self):
        import os

        from gst_plugins_rs_tpu.ops import asr

        el = fx.element_factory_make("whispertranscriber")
        if os.path.exists(asr.DEFAULT_WEIGHTS):
            el.set_state(fx.State.PAUSED)  # builtin asr-lite loads
            assert el._asr_weights is not None
            el.set_state(fx.State.NULL)
        else:
            with pytest.raises(RuntimeError, match="asr-lite"):
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


def _build_transcriber_pipeline(overlay=True, **bin_props):
    bin_ = fx.element_factory_make("transcriberbin")
    bin_.set_property("transcriber::allow-random-weights", True)
    bin_.set_property("transcriber::chunk-duration", 1_000_000_000)
    bin_.set_property("transcriber::max-new-tokens", 3)
    for k, v in bin_props.items():
        bin_.set_property(k.replace("_", "-"), v)
    asrc = fx.element_factory_make("audiotestsrc")
    asrc.set_property("wave", "sine"); asrc.set_property("num-buffers", 4)
    asrc.set_property("samplesperbuffer", 8000)
    acaps = fx.element_factory_make("capsfilter")
    acaps.set_property("caps", parse_caps("audio/x-raw,format=F32,rate=16000,channels=1"))
    vsrc = fx.element_factory_make("videotestsrc")
    vsrc.set_property("pattern", "white"); vsrc.set_property("num-buffers", 6)
    vcaps = fx.element_factory_make("capsfilter")
    vcaps.set_property("caps", parse_caps("video/x-raw,format=RGB,width=320,height=180,framerate=3/1"))
    vsink = fx.element_factory_make("appsink", "vsink")
    asink = fx.element_factory_make("appsink", "asink")
    p = fx.Pipeline()
    elems = [bin_, asrc, acaps, vsrc, vcaps, vsink, asink]
    if overlay:
        ov = fx.element_factory_make("cea608overlay")
        elems.append(ov)
    for e in elems:
        p.add(e)
    asrc.link(acaps)
    acaps.pad("src").link(bin_.pad("sink_audio"))
    vsrc.link(vcaps)
    vcaps.pad("src").link(bin_.pad("sink_video"))
    if overlay:
        bin_.pad("src_video").link(ov.pad("sink"))
        ov.pad("src").link(vsink.pad("sink"))
    else:
        bin_.pad("src_video").link(vsink.pad("sink"))
    bin_.pad("src_audio").link(asink.pad("sink"))
    return p, bin_, vsink, asink


class TestTranscriberBin:
    def test_caption_meta_and_overlay_render(self):
        """Reference model: transcriberbin muxes captions INTO the video
        stream as VideoCaptionMeta (the cccombiner role); a downstream
        cea608overlay consumes the meta and renders visibly
        (transcriberbin/imp.rs:500-607, cea608overlay/imp.rs:264-285)."""
        p, bin_, vsink, asink = _build_transcriber_pipeline(overlay=True)
        p.play_until_eos()
        frames = [np.asarray(s.buffer.data) for s in vsink.samples]
        assert len(frames) == 6
        # 608 overlay visible on late frames (caption box dims white pixels)
        assert (frames[-1] < 250).any()
        # audio passed through untouched on src_audio
        assert len(asink.samples) == 4

    def test_caption_meta_attached(self):
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(overlay=False)
        p.play_until_eos()
        metas = [m for s in vsink.samples for m in s.buffer.metas
                 if isinstance(m, VideoCaptionMeta)]
        assert metas, "no VideoCaptionMeta attached to video buffers"
        assert all(m.caption_type == "cea608-raw" for m in metas)
        assert all(len(m.data) % 2 == 0 and m.data for m in metas)

    def test_passthrough_leaves_video_unmarked(self):
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False, passthrough=True)
        p.play_until_eos()
        assert len(vsink.samples) == 6
        assert not any(isinstance(m, VideoCaptionMeta)
                       for s in vsink.samples for m in s.buffer.metas)
        assert len(asink.samples) == 4

    def test_caption_source_inband_drops_transcription(self):
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False, caption_source="inband")
        p.play_until_eos()
        assert not any(isinstance(m, VideoCaptionMeta)
                       for s in vsink.samples for m in s.buffer.metas)

    def test_property_surface_defaults(self):
        """Defaults match the reference (transcriberbin/imp.rs:31-39)."""
        b = fx.element_factory_make("transcriberbin")
        SECOND = 1_000_000_000
        assert b.get_property("passthrough") is False
        assert b.get_property("latency") == 4 * SECOND
        assert b.get_property("lateness") == 0
        assert b.get_property("translate-latency") == 500_000_000
        assert b.get_property("accumulate-time") == 0
        assert b.get_property("mode") == "roll-up2"
        assert b.get_property("caption-source") == "both"
        assert b.get_property("input-lang-code") == "en-US"
        assert b.get_property("mux-method") == "cea608"

    def test_mux_method_cea708(self):
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False, mux_method="cea708")
        p.play_until_eos()
        metas = [m for s in vsink.samples for m in s.buffer.metas
                 if isinstance(m, VideoCaptionMeta)]
        assert metas
        assert all(m.caption_type == "cea708-raw" for m in metas)


class TestTranslationChannels:
    def test_translation_languages_cc1_cc3(self):
        """translation-languages routes per-language captions to their 608
        channels: cc1 stays field-1, cc3 rides field 2 in S334-1A triplets
        (parse_language_pair model, transcriberbin/imp.rs:70-120).
        `identity` as translator keeps the test offline."""
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False,
            translation_languages="en=cc1,fr=cc3",
            translator="identity")
        p.play_until_eos()
        metas = [m for s in vsink.samples for m in s.buffer.metas
                 if isinstance(m, VideoCaptionMeta)]
        assert metas
        assert all(m.caption_type == "cea608-s334-1a" for m in metas)
        fields = {d[0] for m in metas for d in
                  (m.data[i:i + 3] for i in range(0, len(m.data) - 2, 3))}
        assert fields == {0x80, 0x00}, "both cc1 (field 1) and cc3 (field 2)"
        # triplet framing intact
        for m in metas:
            assert len(m.data) % 3 == 0

    def test_translation_single_cc1_stays_raw(self):
        from gst_plugins_rs_tpu.core import VideoCaptionMeta

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False,
            translation_languages="en=cc1",
            translator="identity")
        p.play_until_eos()
        metas = [m for s in vsink.samples for m in s.buffer.metas
                 if isinstance(m, VideoCaptionMeta)]
        assert metas
        assert all(m.caption_type == "cea608-raw" for m in metas)

    def test_bad_channel_rejected(self):
        import pytest as _pytest

        p, bin_, vsink, asink = _build_transcriber_pipeline(
            overlay=False, translation_languages="fr=cc7",
            translator="identity")
        with _pytest.raises(Exception, match="cc7|channel"):
            p.play_until_eos()
