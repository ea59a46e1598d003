"""Streaming time-shard mode (VERDICT r4 #3): the SP mode must reproduce
the default streaming algorithm SAMPLE-FOR-SAMPLE on long streams while
processing input in bounded chunks with the analysis sharded over the mesh.

Reference semantics being preserved:
/root/reference/audio/audiofx/src/audioloudnorm/imp.rs:89-118,1377-1430
(3 s gain lookahead + limiter FSM).  The sharding split is documented in
parallel/timeshard.sharded_kweight_frame_analysis: the input analysis
(K-weighting, subblock energies, peaks) is parallel; the gain/limiter
chain is a feedback loop through r128_out and stays sequential.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gst_plugins_rs_tpu.ops import loudnorm as LN
from gst_plugins_rs_tpu.ops.ebur128 import r128_add_full_subblocks
from gst_plugins_rs_tpu.parallel.timeshard import (
    sharded_kweight_frame_analysis,
)

RATE = 192_000


@pytest.fixture()
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("time",))


def _signal(seconds, ch=2, seed=7, tail=0, amp=0.1):
    rng = np.random.RandomState(seed)
    n = int(seconds * RATE) + tail
    x = (rng.standard_normal((n, ch)) * amp).astype(np.float64)
    x[:, 0] *= np.sin(np.linspace(0.0, 40.0, n))
    return x


def _run_element(sig, time_shard, mode="streaming", collect_messages=False):
    from gst_plugins_rs_tpu import parse_launch
    from gst_plugins_rs_tpu.core import Buffer, Caps, SECOND

    p = parse_launch(
        "appsrc name=src ! audioloudnorm name=ln ! appsink name=sink")
    if time_shard:
        p.by_name("ln").set_property("time-shard", True)
        p.by_name("ln").set_property("time-shard-mode", mode)
    src = p.by_name("src")
    src.set_property("caps", Caps.builder(
        "audio/x-raw", format="F64", rate=RATE,
        channels=sig.shape[1], layout="interleaved"))
    messages = []
    if collect_messages:
        p.bus.add_watch(messages.append)
    spb = 19200
    for i in range(0, sig.shape[0], spb):
        chunk = sig[i:i + spb]
        src.push_buffer(Buffer(
            chunk, pts=i * SECOND // RATE, offset=i,
            duration=chunk.shape[0] * SECOND // RATE))
    src.end_of_stream()
    p.play_until_eos()
    sink = p.by_name("sink")
    out = np.concatenate(
        [np.asarray(s.buffer.data) for s in sink.samples], axis=0)
    return (out, messages) if collect_messages else out


class TestShardedAnalysis:
    """Phase A must bit-match the sequential r128 input analysis."""

    def test_energies_and_peaks_match(self, mesh):
        ch = 2
        params = LN.loudnorm_params(-24.0, 7.0, -2.0, ch, jnp.float64)
        m_frames = 16
        x = jnp.asarray(_signal(m_frames / 10.0, ch, seed=3))
        # reference: sequential add, reading back the per-subblock energies
        dev = LN.loudnorm_init(params, ch, 0.0, jnp.float64)
        seq = []
        st = dev.r128_in
        for i in range(m_frames):
            st2 = r128_add_full_subblocks(
                st, params.r128, x[i * LN.FRAME:(i + 1) * LN.FRAME])
            seq.append(float(st2.subblocks[-1]))
            st = st2
        with mesh:
            e, sp, fz = sharded_kweight_frame_analysis(
                jax.device_put(x, NamedSharding(mesh, P("time"))),
                dev.r128_in.filt_z, params, mesh, m_frames)
        np.testing.assert_allclose(np.asarray(e), np.asarray(seq),
                                   rtol=1e-9)
        ref_sp = np.max(np.abs(np.asarray(x)).reshape(
            m_frames, LN.FRAME, ch), axis=1)
        np.testing.assert_allclose(np.asarray(sp), ref_sp, rtol=0, atol=0)
        # exit filter state matches the sequential filter's
        np.testing.assert_allclose(np.asarray(fz), np.asarray(st.filt_z),
                                   rtol=1e-9, atol=1e-18)

    def test_carried_entry_state(self, mesh):
        """Chunk 2's analysis must continue chunk 1's filter state exactly
        (A^(L*k) entry propagation)."""
        ch = 1
        params = LN.loudnorm_params(-24.0, 7.0, -2.0, ch, jnp.float64)
        m = 8
        x = jnp.asarray(_signal(2 * m / 10.0, ch, seed=5))
        dev = LN.loudnorm_init(params, ch, 0.0, jnp.float64)
        # sequential over both chunks
        st = r128_add_full_subblocks(dev.r128_in, params.r128, x)
        seq_e = np.asarray(st.subblocks[-16:])
        with mesh:
            e1, _, fz1 = sharded_kweight_frame_analysis(
                x[:m * LN.FRAME], dev.r128_in.filt_z, params, mesh, m)
            e2, _, fz2 = sharded_kweight_frame_analysis(
                x[m * LN.FRAME:], fz1, params, mesh, m)
        got = np.concatenate([np.asarray(e1), np.asarray(e2)])
        np.testing.assert_allclose(got, seq_e, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(fz2), np.asarray(st.filt_z),
                                   rtol=1e-9, atol=1e-18)


class TestStreamingShardElement:
    def test_sample_parity_6s(self, mesh):
        """>= 6 s stream: first frame + one full sharded chunk + leftover +
        drain — output must match the default path sample-for-sample
        (VERDICT r4 #3 'done' bar)."""
        sig = _signal(6.5, ch=2, seed=11)
        with mesh:
            ref = _run_element(sig, time_shard=False)
            got = _run_element(sig, time_shard=True, mode="streaming")
        assert ref.shape == got.shape
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_sample_parity_with_limiter_peaks(self, mesh):
        """Loud ticks drive the limiter FSM through attack/sustain/release;
        the sharded mode must still be sample-parity."""
        sig = _signal(6.5, ch=2, seed=13, amp=0.05)
        # periodic loud ticks (the reference's limiter stress pattern,
        # audio/audiofx/tests/audioloudnorm.rs:174-257)
        for pos in range(RATE // 2, sig.shape[0] - 8, RATE):
            sig[pos:pos + 4] = 0.6
        with mesh:
            ref = _run_element(sig, time_shard=False)
            got = _run_element(sig, time_shard=True, mode="streaming")
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_bounded_memory_incremental_output(self, mesh):
        """Streaming mode emits output BEFORE EOS (the linear mode cannot)
        and never accumulates more than first-frame/chunk in the adapter."""
        from gst_plugins_rs_tpu import parse_launch
        from gst_plugins_rs_tpu.core import Buffer, Caps, SECOND, State

        p = parse_launch(
            "appsrc name=src ! audioloudnorm name=ln ! appsink name=sink")
        ln = p.by_name("ln")
        ln.set_property("time-shard", True)
        ln.set_property("time-shard-mode", "streaming")
        src = p.by_name("src")
        sig = _signal(6.5, ch=1, seed=2)
        src.set_property("caps", Caps.builder(
            "audio/x-raw", format="F64", rate=RATE, channels=1,
            layout="interleaved"))
        sink = p.by_name("sink")
        chunk_frames = 8 * ln._TS_FRAMES_PER_DEV
        max_adapter = 0
        spb = 19200
        with mesh:
            p.set_state(State.PLAYING)
            for i in range(0, sig.shape[0], spb):
                c = sig[i:i + spb]
                src.push_buffer(Buffer(
                    c, pts=i * SECOND // RATE, offset=i,
                    duration=c.shape[0] * SECOND // RATE))
                p.run(max_iterations=4)
                if ln._state is not None:
                    max_adapter = max(max_adapter,
                                      ln._state.adapter.available())
            assert len(sink.samples) > 0, "no output before EOS"
            src.end_of_stream()
            p.play_until_eos()
        # adapter residue bound: strictly less than first frame (3 s) or
        # one chunk — the element drains every time either fills
        bound = max(3 * RATE, chunk_frames * LN.FRAME)
        assert 0 < max_adapter < bound

    def test_linear_mode_divergence_pinned(self, mesh):
        """time-shard-mode=linear on a >= 6 s stream produces DIFFERENT
        output than the streaming algorithm (whole-stream single gain) —
        the documented divergence, pinned (VERDICT r4 #3/#8)."""
        sig = _signal(6.5, ch=1, seed=4)
        with mesh:
            ref = _run_element(sig, time_shard=False)
            lin = _run_element(sig, time_shard=True, mode="linear")
        assert ref.shape == lin.shape
        assert float(np.max(np.abs(ref - lin))) > 1e-6

    def test_linear_mode_warns_past_3s(self, mesh):
        """Linear mode posts a WARNING bus message once input crosses 3 s."""
        from gst_plugins_rs_tpu.core import MessageType

        sig = _signal(3.5, ch=1, seed=6)
        with mesh:
            _, messages = _run_element(sig, time_shard=True, mode="linear",
                                       collect_messages=True)
        warns = [m for m in messages
                 if m.type == MessageType.WARNING and m.structure is not None
                 and m.structure.name == "audioloudnorm-time-shard-linear"]
        assert len(warns) == 1

    def test_streaming_mode_no_warning(self, mesh):
        from gst_plugins_rs_tpu.core import MessageType

        sig = _signal(3.5, ch=1, seed=6)
        with mesh:
            _, messages = _run_element(sig, time_shard=True,
                                       mode="streaming",
                                       collect_messages=True)
        assert not [m for m in messages if m.type == MessageType.WARNING]
