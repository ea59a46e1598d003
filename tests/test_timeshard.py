"""Time-axis (sequence) parallelism tests: FIR halo exchange over the mesh
must match unsharded results exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gst_plugins_rs_tpu.parallel.timeshard import sharded_block_loudness, sharded_fir


@pytest.fixture()
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("time",))


def test_sharded_fir_matches_unsharded(mesh):
    rng = np.random.RandomState(0)
    N, T = 8 * 1024, 33
    x = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    h = jnp.asarray(rng.uniform(-1, 1, T).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P("time")))
    with mesh:
        y = sharded_fir(xs, h, mesh)
    ref = np.convolve(np.asarray(x), np.asarray(h), mode="full")[:N]
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
    assert len(y.sharding.device_set) == 8


def test_sharded_fir_tap1(mesh):
    x = jnp.asarray(np.arange(8 * 16, dtype=np.float32))
    h = jnp.asarray(np.asarray([2.0], np.float32))
    with mesh:
        y = sharded_fir(jax.device_put(x, NamedSharding(mesh, P("time"))), h, mesh)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.asarray(x))


def test_sharded_block_loudness(mesh):
    rng = np.random.RandomState(1)
    n100 = 64
    N = 8 * n100 * 4
    x = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    with mesh:
        e = sharded_block_loudness(
            jax.device_put(x, NamedSharding(mesh, P("time"))), mesh, n100
        )
    ref = np.sum(np.asarray(x).reshape(-1, n100) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(e), ref, rtol=1e-5)


class TestShardedLoudnormLinear:
    """VERDICT r3 #4: time-axis sharding wired into the loudnorm path.
    The sharded whole-stream linear normalizer must be sample-parity with
    the single-device element/ops linear path (imp.rs:323-366,781-816)."""

    RATE = 192_000

    def _signal(self, seconds, ch=2, seed=7, tail=321):
        rng = np.random.RandomState(seed)
        n = int(seconds * self.RATE) + tail
        x = (rng.standard_normal((n, ch)) * 0.1).astype(np.float64)
        x[:, 0] *= np.sin(np.linspace(0.0, 40.0, n))
        return x

    def test_ops_parity_long_stream(self, mesh):
        """4.6 s stream, 8 shards: gain, output samples and integrated
        loudness bit-match the single-device linear computation."""
        from gst_plugins_rs_tpu.ops import loudnorm as LN
        from gst_plugins_rs_tpu.ops.ebur128 import (
            loudness_global,
            r128_add_full_subblocks,
        )
        from gst_plugins_rs_tpu.parallel.timeshard import (
            sharded_loudnorm_linear,
        )

        ch = 2
        n100 = LN.RATE // 10
        x = self._signal(4.6, ch)
        n = x.shape[0]
        params = LN.loudnorm_params(-24.0, 7.0, -2.0, ch, jnp.float64)

        nfull = (n // n100) * n100
        dev = LN.loudnorm_init(params, ch, 0.0, jnp.float64)
        dev = dev._replace(r128_in=r128_add_full_subblocks(
            dev.r128_in, params.r128, jnp.asarray(x[:nfull])))
        gain_ref = float(LN.linear_gain_from_global(dev, params))
        gl_ref = float(loudness_global(dev.r128_in, params.r128))

        stride = 8 * n100
        npad = -(-n // stride) * stride
        xp = np.zeros((npad, ch))
        xp[:n] = x
        with mesh:
            y, gain, gl = sharded_loudnorm_linear(
                jnp.asarray(xp), params, mesh, n_valid_sb=nfull // n100)
        assert len(y.sharding.device_set) == 8
        np.testing.assert_allclose(float(gain), gain_ref, rtol=1e-12)
        np.testing.assert_allclose(float(gl), gl_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(y)[:n], x * gain_ref,
                                   rtol=1e-12, atol=0)

    def _run_element(self, sig, time_shard, mode="linear"):
        from gst_plugins_rs_tpu import parse_launch
        from gst_plugins_rs_tpu.core import Buffer, Caps, SECOND

        p = parse_launch(
            "appsrc name=src ! audioloudnorm name=ln ! appsink name=sink")
        if time_shard:
            p.by_name("ln").set_property("time-shard", True)
            p.by_name("ln").set_property("time-shard-mode", mode)
        src = p.by_name("src")
        src.set_property("caps", Caps.builder(
            "audio/x-raw", format="F64", rate=self.RATE,
            channels=sig.shape[1], layout="interleaved"))
        spb = 19200
        for i in range(0, sig.shape[0], spb):
            chunk = sig[i:i + spb]
            src.push_buffer(Buffer(
                chunk, pts=i * SECOND // self.RATE, offset=i,
                duration=chunk.shape[0] * SECOND // self.RATE))
        src.end_of_stream()
        p.play_until_eos()
        sink = p.by_name("sink")
        return np.concatenate(
            [np.asarray(s.buffer.data) for s in sink.samples], axis=0)

    def test_element_parity_sub3s(self, mesh):
        """Sub-3 s stream: the default element takes the LINEAR path, so
        time-shard=true must reproduce it sample-for-sample."""
        sig = self._signal(0.53, ch=2)
        ref = self._run_element(sig, time_shard=False)
        sharded = self._run_element(sig, time_shard=True)
        assert ref.shape == sharded.shape == sig.shape
        np.testing.assert_allclose(sharded, ref, rtol=1e-12, atol=0)

    def test_element_long_stream_hits_target(self, mesh):
        """Long (>3 s) stream through the SP mode: whole-stream linear
        normalization lands the re-measured integrated loudness on target."""
        from gst_plugins_rs_tpu.ops.ebur128 import EbuR128

        sig = self._signal(4.6, ch=1, seed=3)
        out = self._run_element(sig, time_shard=True)
        assert out.shape == sig.shape
        r128 = EbuR128(1, self.RATE)
        r128.add_frames(out)
        assert abs(r128.loudness_global() - (-24.0)) < 1.0
