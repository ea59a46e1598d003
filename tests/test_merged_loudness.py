"""Shared R-128 gating-histogram reduction across sharded streams (the
SURVEY.md §2.3 north-star collective)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gst_plugins_rs_tpu.parallel.streams import make_stream_mesh, r128_bank

RATE = 48000


def sig(amp, secs, ch=1):
    t = np.arange(int(secs * RATE)) / RATE
    return np.repeat((amp * np.sin(2 * np.pi * 997.0 * t))[:, None], ch, axis=1)


def test_merged_equals_per_stream_for_identical_streams():
    bank = r128_bank(4, channels=1, rate=RATE)
    x = np.repeat(sig(0.5, 2.0)[None], 4, axis=0).astype(np.float32)
    bank.add_frames(jnp.asarray(x))
    per = bank.per_stream_loudness()
    merged = bank.merged_loudness()
    assert np.allclose(per, per[0])
    assert merged == pytest.approx(float(per[0]), abs=0.05)
    assert abs(merged + 9.0) < 0.2


def test_merged_pools_gated_blocks():
    # loud + 20dB-quieter stream: pooling the histograms makes the relative
    # gate (-10 LU below the pooled mean) exclude the quiet stream's blocks,
    # so the merged loudness tracks the loud stream — correct R-128 gating
    bank = r128_bank(2, channels=1, rate=RATE)
    loud = sig(0.5, 2.0)
    quiet = sig(0.05, 2.0)
    x = np.stack([loud, quiet]).astype(np.float32)
    bank.add_frames(jnp.asarray(x))
    per = bank.per_stream_loudness()
    merged = bank.merged_loudness()
    assert per[0] > per[1]
    assert merged == pytest.approx(float(per[0]), abs=0.2)

    # with a 6 dB spread both streams pass the gate: merged sits between
    bank2 = r128_bank(2, channels=1, rate=RATE)
    x2 = np.stack([sig(0.5, 2.0), sig(0.25, 2.0)]).astype(np.float32)
    bank2.add_frames(jnp.asarray(x2))
    p2 = bank2.per_stream_loudness()
    m2 = bank2.merged_loudness()
    assert p2[1] + 0.1 < m2 < p2[0] + 0.1


def test_merged_on_mesh_sharded_bank():
    mesh = make_stream_mesh(8)
    bank = r128_bank(8, channels=1, rate=RATE, mesh=mesh)
    x = np.repeat(sig(0.25, 1.0)[None], 8, axis=0).astype(np.float32)
    with mesh:
        bank.add_frames(jnp.asarray(x))
        merged = bank.merged_loudness()
    # states live sharded; the reduction crossed all 8 devices
    leaf = bank.states.block_hist
    assert len(leaf.sharding.device_set) == 8
    assert abs(merged - (-9.0 - 6.02)) < 0.2  # 0.25 sine ~ -15 LUFS
