"""Pallas hsv kernel: numerical equivalence with the XLA path.

CI runs on CPU, so the kernel executes in the Pallas interpreter here; the
compiled path is exercised on the real chip by the driver/verify runs
(PERF_NOTES.md records the on-chip A/B)."""
import numpy as np
import jax.numpy as jnp

from gst_plugins_rs_tpu.ops.hsv import hsv_filter_frame
from gst_plugins_rs_tpu.ops.pallas_hsv import hsv_filter_pallas


def test_matches_xla_kernel():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (64, 512, 3), np.uint8)
    params = jnp.asarray([123.0, 1.1, -0.05, 0.95, 0.02], jnp.float32)
    r = jnp.asarray(frame[..., 0], jnp.float32) / 255.0
    g = jnp.asarray(frame[..., 1], jnp.float32) / 255.0
    b = jnp.asarray(frame[..., 2], jnp.float32) / 255.0
    ro, go, bo = hsv_filter_pallas(r, g, b, params, interpret=True)
    got = np.stack(
        [np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8) for x in (ro, go, bo)],
        axis=-1,
    )
    ref = np.asarray(hsv_filter_frame(jnp.asarray(frame), params, offsets=(0, 1, 2)))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_non_tile_multiple_shapes():
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, (50, 300, 3), np.uint8)  # not tile multiples
    params = jnp.asarray([45.0, 1.0, 0.0, 1.0, 0.0], jnp.float32)
    planes = [jnp.asarray(frame[..., i], jnp.float32) / 255.0 for i in range(3)]
    ro, go, bo = hsv_filter_pallas(*planes, params, interpret=True)
    assert ro.shape == (50, 300)
    ref = np.asarray(hsv_filter_frame(jnp.asarray(frame), params, offsets=(0, 1, 2)))
    got = np.stack(
        [np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8) for x in (ro, go, bo)],
        axis=-1,
    )
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
