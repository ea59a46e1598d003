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
