"""Fused C3 Pallas kernel parity vs the XLA s2d path.

The kernel (ops/pallas_yolox_c3.py) is a scheduling rewrite only — same
folded weights, same chain as models/yolox_fast._c3_s2d, which itself is
gated against the flax model.  Reference semantics:
/root/reference/analytics/burn/src/yolox_burn/model/darknet.rs:19-135.
Runs in Pallas interpreter mode on the CPU test mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gst_plugins_rs_tpu.models.yolox import Yolox
from gst_plugins_rs_tpu.models.yolox_fast import apply_fast
from gst_plugins_rs_tpu.models import yolox_fast as yf
from gst_plugins_rs_tpu.ops.pallas_yolox_c3 import c3_s2d_fused


def _random_c3_params(rng, c4, hidden, n):
    """Build a C3 param/stat tree in the flax layout (normal domain:
    channels c4//4 in, hidden//4 hidden)."""
    def conv_bn(ci, co, k):
        return (
            {"conv": {"kernel": jnp.asarray(
                rng.randn(k, k, ci, co).astype(np.float32) * 0.2)},
             "bn": {"scale": jnp.asarray(
                        1.0 + 0.1 * rng.randn(co).astype(np.float32)),
                    "bias": jnp.asarray(
                        0.1 * rng.randn(co).astype(np.float32))}},
            {"bn": {"mean": jnp.asarray(
                        0.05 * rng.randn(co).astype(np.float32)),
                    "var": jnp.asarray(
                        (1.0 + 0.1 * rng.rand(co)).astype(np.float32))}},
        )

    ci, h = c4 // 4, hidden // 4
    params, stats = {}, {}
    params["conv1"], stats["conv1"] = conv_bn(ci, h, 1)
    params["conv2"], stats["conv2"] = conv_bn(ci, h, 1)
    for i in range(n):
        p1, s1 = conv_bn(h, h, 1)
        p2, s2 = conv_bn(h, h, 3)
        params[f"m_{i}"] = {"conv1": p1, "conv2": p2}
        stats[f"m_{i}"] = {"conv1": s1, "conv2": s2}
    params["conv3"], stats["conv3"] = conv_bn(2 * h, ci, 1)
    return params, stats


class TestC3FusedParity:
    @pytest.mark.parametrize("n", [1, 2])
    @pytest.mark.parametrize("hw", [(8, 8), (10, 6)])
    def test_matches_xla_c3(self, n, hw):
        rng = np.random.RandomState(11 + n)
        c4, hidden = 32, 16
        params, stats = _random_c3_params(rng, c4, hidden, n)
        H, W = hw
        y = jnp.asarray(rng.randn(2, H, W, c4).astype(np.float32))

        ref = yf._c3_s2d(params, stats, y, n)
        wts = yf._c3_fused_weights(params, stats, n)
        got = c3_s2d_fused(y, **wts, width=W, n=n, interpret=True)
        assert got.shape == ref.shape
        err = float(jnp.abs(ref - got).max())
        assert err < 1e-4, err

    def test_bf16_mode_matches_xla_bf16(self):
        """Same bf16 storage points as the XLA path — the comparison
        isolates kernel bugs from bf16 rounding noise."""
        rng = np.random.RandomState(5)
        params, stats = _random_c3_params(rng, 32, 16, 1)
        y = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
        yb = y.astype(jnp.bfloat16)
        ref = yf._c3_s2d(params, stats, yb, 1).astype(jnp.float32)
        wts = yf._c3_fused_weights(params, stats, 1)
        got = c3_s2d_fused(yb, **wts, width=8, n=1, interpret=True)
        assert got.dtype == jnp.bfloat16
        rel = jnp.abs(ref - got.astype(jnp.float32)) / (jnp.abs(ref) + 1e-1)
        assert float(rel.max()) < 0.05

    def test_full_model_fused_matches(self):
        """apply_fast(fuse_c3=True) end-to-end vs the unfused engine."""
        rng = np.random.RandomState(3)
        m = Yolox.from_variant("tiny")
        x = jnp.asarray(rng.randint(0, 256, (1, 96, 96, 3)).astype(np.uint8))
        v = m.init(jax.random.PRNGKey(0), x)
        ref = apply_fast(m, v, x)
        got = apply_fast(m, v, x, fuse_c3=True, interpret=True)
        rel = jnp.abs(ref - got) / (jnp.abs(ref) + 1e-2)
        assert float(rel.max()) < 1e-3
