"""rsaudioecho element tests: sample-exact vs a scalar NumPy oracle that
implements the reference ring-buffer semantics
(audio/audiofx/src/audioecho/imp.rs:69-85, ring_buffer.rs:44-76)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Harness,
    SECOND,
    element_factory_make,
)


def echo_oracle(data_flat, ring, pos, delay, intensity, feedback):
    """Scalar reference: ring size S; read at (S - delay + pos) % S."""
    S = ring.shape[0]
    out = np.empty_like(data_flat)
    read = (S - delay + pos) % S
    write = pos % S
    for i, x in enumerate(data_flat):
        e = ring[read]
        out[i] = x + intensity * e
        ring[write] = x + feedback * e
        read = (read + 1) % S
        write = (write + 1) % S
    return out, ring, write


def run_element(chunks, rate=48000, channels=2, fmt="F32", **props):
    elem = element_factory_make("rsaudioecho")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("audio/x-raw", format=fmt, rate=rate, channels=channels, layout="interleaved"))
    outs = []
    for i, c in enumerate(chunks):
        n0 = sum(x.shape[0] for x in chunks[:i])
        h.push(Buffer(c, pts=n0 * SECOND // rate, offset=n0))
        while h.buffers_received():
            outs.append(h.pull())
    return outs


@pytest.mark.parametrize("delay_ms,feedback", [(250, 0.0), (250, 0.5), (10, 0.4), (1000, 0.3)])
def test_echo_matches_oracle(delay_ms, feedback):
    rate, ch = 8000, 2
    rng = np.random.RandomState(42)
    chunks = [rng.uniform(-1, 1, (256, ch)).astype(np.float32) for _ in range(6)]
    delay_ns = delay_ms * 1_000_000
    outs = run_element(chunks, rate=rate, channels=ch, delay=delay_ns, intensity=0.6, feedback=feedback)
    got = np.concatenate([np.asarray(o.data) for o in outs], axis=0)

    max_delay_ns = SECOND
    S = ((max_delay_ns * rate) // SECOND) * ch
    d = (min(delay_ns, max_delay_ns) * ch * rate) // SECOND
    ring = np.zeros(S, np.float64)
    flat = np.concatenate([c for c in chunks], axis=0).reshape(-1).astype(np.float64)
    ref, _, _ = echo_oracle(flat, ring, 0, d if d > 0 else S, 0.6, feedback)
    np.testing.assert_allclose(got.reshape(-1), ref.astype(np.float32), atol=2e-6)


def test_echo_f64_sample_exact():
    rate, ch = 4000, 1
    rng = np.random.RandomState(1)
    chunks = [rng.uniform(-1, 1, (100, ch)).astype(np.float64) for _ in range(5)]
    delay_ns = 30 * 1_000_000  # 30 ms -> 120 samples: chunk smaller than buffer
    outs = run_element(chunks, rate=rate, channels=ch, fmt="F64", delay=delay_ns, intensity=0.5, feedback=0.7)
    got = np.concatenate([np.asarray(o.data) for o in outs], axis=0).reshape(-1)

    S = rate * ch
    d = (delay_ns * ch * rate) // SECOND
    ring = np.zeros(S, np.float64)
    flat = np.concatenate(chunks, axis=0).reshape(-1)
    ref, _, _ = echo_oracle(flat, ring, 0, d, 0.5, 0.7)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_echo_delay_exceeds_buffer_is_clamped():
    # delay property defaults to 500 s, max-delay 1 s -> clamped to 1 s
    rate, ch = 1000, 1
    sig = np.zeros((2500, ch), np.float32)
    sig[0, 0] = 1.0
    outs = run_element([sig], rate=rate, channels=ch, intensity=0.5)
    got = np.concatenate([np.asarray(o.data) for o in outs], axis=0).reshape(-1)
    assert got[0] == 1.0
    assert got[rate] == 0.5  # echo after exactly max-delay (1 s)


def test_echo_passes_timestamps():
    rate, ch = 48000, 2
    chunks = [np.zeros((1024, ch), np.float32) for _ in range(3)]
    outs = run_element(chunks, rate=rate, channels=ch, delay=SECOND // 2)
    assert [o.pts for o in outs] == [0, 1024 * SECOND // rate, 2048 * SECOND // rate]


def test_echo_latency_is_zero():
    elem = element_factory_make("rsaudioecho")
    h = Harness(elem)
    h.set_src_caps(Caps.builder("audio/x-raw", format="F32", rate=48000, channels=2, layout="interleaved"))
    q = h.query_latency()
    assert q.result["min_latency"] == 0
