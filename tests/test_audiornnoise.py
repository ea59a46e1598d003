"""audiornnoise tests — port of the reference scenarios
(audio/audiofx/tests/audiornnoise.rs:38-80: silence in -> exact zeros out,
in/out sample-count conservation across EOS drain) plus meta/latency checks."""
import numpy as np

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
    # batched front-end dispatches tile differently per batch size, so
    # split invariance holds to float tolerance (~0.1 s16 LSB), not bitwise
    np.testing.assert_allclose(o1, o2, atol=1e-5)


def test_caps_restricted_to_48k():

    elem = element_factory_make("audiornnoise")
    h = Harness(elem)

    caps = Caps.builder("audio/x-raw", format="F32", rate=44100, channels=1, layout="interleaved")
    srcpad = h.srcpad

    assert srcpad.peer.pad_template_caps().intersect(caps).is_empty()


def test_fast_path_matches_scan():
    """denoise_frames_fast (batched front end + GRU-only scan) must match
    the sequential denoise_frames_scan within float tolerance, including
    state carried across dispatches.  Tolerances reflect the different
    (equally valid) float path of the blocked-IIR HP filter (~5e-5
    relative on the input) amplified through the recurrent GRU — the
    fast path itself is bitwise split-invariant (per-frame blocks)."""
    import jax.numpy as jnp

    from gst_plugins_rs_tpu.ops.rnnoise import (
        FRAME_SIZE,
        default_weights,
        denoise_frames_fast,
        denoise_frames_scan,
        denoise_init,
    )

    w = {k: jnp.asarray(v) for k, v in default_weights().items()}
    rng = np.random.RandomState(0)
    frames1 = jnp.asarray(rng.uniform(-0.4, 0.4, (7, 2, FRAME_SIZE)) * 32767,
                          jnp.float32)
    frames2 = jnp.asarray(rng.uniform(-0.4, 0.4, (5, 2, FRAME_SIZE)) * 32767,
                          jnp.float32)
    # include a silent stretch to exercise the freeze path
    frames2 = frames2.at[2].set(0.0)

    s_a = denoise_init(2)
    s_b = denoise_init(2)
    outs_a, vads_a, outs_b, vads_b = [], [], [], []
    for fr in (frames1, frames2):
        s_a, o, v = denoise_frames_scan(s_a, w, fr)
        outs_a.append(np.asarray(o)); vads_a.append(np.asarray(v))
        s_b, o, v = denoise_frames_fast(s_b, w, fr)
        outs_b.append(np.asarray(o)); vads_b.append(np.asarray(v))
    for oa, ob in zip(outs_a, outs_b):
        np.testing.assert_allclose(oa, ob, atol=60.0)  # <2e-3 of s16 full scale
    for va, vb in zip(vads_a, vads_b):
        np.testing.assert_allclose(va, vb, atol=2e-2)
    # carried state equivalent too
    np.testing.assert_allclose(np.asarray(s_a.synthesis_mem),
                               np.asarray(s_b.synthesis_mem), atol=60.0)
    np.testing.assert_allclose(np.asarray(s_a.rnn.vad_h),
                               np.asarray(s_b.rnn.vad_h), atol=2e-2)
