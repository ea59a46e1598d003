"""audiornnoise tests — port of the reference scenarios
(audio/audiofx/tests/audiornnoise.rs:38-80: silence in -> exact zeros out,
in/out sample-count conservation across EOS drain) plus meta/latency checks."""
import numpy as np
import pytest

from gst_plugins_rs_tpu.core import Buffer, Caps, Harness, SECOND, element_factory_make
from gst_plugins_rs_tpu.elements.audiofx.audiornnoise import AudioLevelMeta


def build(channels=2, **props):
    elem = element_factory_make("audiornnoise")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(
        Caps.builder("audio/x-raw", format="F32", rate=48000, channels=channels, layout="interleaved")
    )
    return h, elem


def test_silence_in_zeros_out_and_conservation():
    h, _ = build(channels=2)
    total_in = 0
    for i in range(5):
        n = 1024
        h.push(Buffer(np.zeros((n, 2), np.float32), pts=total_in * SECOND // 48000))
        total_in += n
    h.push_eos()
    outs = h.pull_all()
    total_out = sum(int(b.data.shape[0]) for b in outs)
    assert total_out == total_in
    for b in outs:
        np.testing.assert_array_equal(np.asarray(b.data), 0.0)


def test_audio_level_meta_attached():
    h, _ = build(channels=1)
    h.push(Buffer(np.zeros((960, 1), np.float32), pts=0))
    b = h.pull()
    meta = b.get_meta(AudioLevelMeta)
    assert meta is not None
    # silence: rms=0 -> -20*log10(f32::EPSILON) = 138 (reference formula,
    # imp.rs:246 — the epsilon guard caps the level below 255)
    assert meta.level == 138
    assert meta.voice_activity is False


def test_output_framing():
    # 1000 samples -> one 960-sample buffer out, 40 left buffered
    h, _ = build(channels=1)
    h.push(Buffer(np.random.RandomState(0).uniform(-0.1, 0.1, (1000, 1)).astype(np.float32), pts=0))
    b = h.pull()
    assert b.data.shape[0] == 960
    assert h.try_pull() is None
    h.push_eos()
    residue = h.pull()
    assert residue.data.shape[0] == 40
    assert residue.pts == 960 * SECOND // 48000


def test_latency():
    h, _ = build()
    q = h.query_latency()
    assert q.result["min_latency"] == 480 * SECOND // 48000


def test_vad_threshold_zeroes_everything():
    # threshold 1.0: nothing can pass (vad < 1.0 always with sigmoid)
    h, _ = build(channels=1, voice_activity_threshold=1.0)
    sig = np.random.RandomState(1).uniform(-0.5, 0.5, (4800, 1)).astype(np.float32)
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    np.testing.assert_array_equal(out, 0.0)


def test_denoiser_state_streams_across_buffers():
    # same input split differently must produce identical output
    sig = np.random.RandomState(2).uniform(-0.3, 0.3, (1920, 1)).astype(np.float32)
    h1, _ = build(channels=1, seed=3)
    h1.push(Buffer(sig, pts=0))
    o1 = np.concatenate([np.asarray(b.data) for b in h1.pull_all()])
    h2, _ = build(channels=1, seed=3)
    h2.push(Buffer(sig[:500], pts=0))
    h2.push(Buffer(sig[500:], pts=500 * SECOND // 48000))
    o2 = np.concatenate([np.asarray(b.data) for b in h2.pull_all()])
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_caps_restricted_to_48k():
    from gst_plugins_rs_tpu.core import State

    elem = element_factory_make("audiornnoise")
    h = Harness(elem)
    import pytest as _pytest

    caps = Caps.builder("audio/x-raw", format="F32", rate=44100, channels=1, layout="interleaved")
    srcpad = h.srcpad
    from gst_plugins_rs_tpu.core import Event

    assert srcpad.peer.pad_template_caps().intersect(caps).is_empty()
