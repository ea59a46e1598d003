"""yolox_fast: the s2d-domain inference engine must match the flax model.

Parity target: analytics/burn/src/yoloxinference/imp.rs:415-472 (same
weights, same detections); the engine itself is a TPU scheduling choice
(PERF_NOTES.md "YOLOX s2d engine").
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from gst_plugins_rs_tpu.models.yolox import Yolox
from gst_plugins_rs_tpu.models.yolox_fast import (
    apply_fast, s2d, s2d_kernel_1x1, s2d_kernel_s1, s2d_kernel_s2, un_s2d)

DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, W, s, p):
    return lax.conv_general_dilated(
        x, W, (s, s), [(p, p), (p, p)], dimension_numbers=DN)


class TestS2dKernels:
    """Each constructed kernel must reproduce the original conv exactly
    (up to f32 reassociation) on random tensors, including edge padding."""

    def setup_method(self, _):
        self.rng = np.random.RandomState(7)

    def _x(self, shape):
        return jnp.asarray(self.rng.randn(*shape).astype(np.float32))

    def test_s2d_roundtrip(self):
        x = self._x((2, 8, 12, 5))
        assert jnp.array_equal(un_s2d(s2d(x)), x)

    def test_stride1_3x3(self):
        x, W = self._x((2, 16, 20, 5)), self._x((3, 3, 5, 7))
        ref = _conv(x, W, 1, 1)
        got = un_s2d(_conv(s2d(x), s2d_kernel_s1(W), 1, 1))
        assert float(jnp.abs(ref - got).max()) < 1e-4

    def test_stride2_3x3(self):
        x, W = self._x((2, 16, 20, 5)), self._x((3, 3, 5, 7))
        ref = _conv(x, W, 2, 1)
        got = un_s2d(_conv(s2d(x), s2d_kernel_s2(W), 2, 1))
        assert float(jnp.abs(ref - got).max()) < 1e-4

    def test_1x1(self):
        x, W = self._x((2, 16, 20, 6)), self._x((1, 1, 6, 4))
        ref = _conv(x, W, 1, 0)
        got = un_s2d(_conv(s2d(x), s2d_kernel_1x1(W), 1, 0))
        assert float(jnp.abs(ref - got).max()) < 1e-4


class TestApplyFast:
    @pytest.mark.parametrize("variant", ["tiny", "s"])
    def test_matches_flax_model(self, variant):
        rng = np.random.RandomState(3)
        m = Yolox.from_variant(variant)
        x = jnp.asarray(rng.randint(0, 256, (2, 96, 96, 3)).astype(np.uint8))
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        got = apply_fast(m, v, x)
        assert got.shape == ref.shape
        rel = jnp.abs(ref - got) / (jnp.abs(ref) + 1e-2)
        assert float(rel.max()) < 1e-3

    def test_bf16_close(self):
        rng = np.random.RandomState(4)
        m = Yolox.from_variant("tiny")
        x = jnp.asarray(rng.randint(0, 256, (1, 96, 96, 3)).astype(np.uint8))
        v = m.init(jax.random.PRNGKey(0), x)
        f32 = apply_fast(m, v, x)
        b16 = apply_fast(m, v, x, dtype=jnp.bfloat16)
        assert b16.dtype == jnp.float32  # decode always f32
        # scores (sigmoid outputs, cols 4:) stay within a few percent
        assert float(jnp.abs(f32[..., 4:] - b16[..., 4:]).max()) < 0.05

    def test_fast_bf16_stem_detection_parity(self):
        """engine=fast-bf16 (bf16 stem+dark2 only) must keep detections:
        same top-ranked cells, boxes within ~a pixel, scores within 5%."""
        rng = np.random.RandomState(6)
        m = Yolox.from_variant("tiny")
        x = jnp.asarray(rng.randint(0, 256, (1, 128, 128, 3)).astype(np.uint8))
        v = m.init(jax.random.PRNGKey(0), x)
        f32 = apply_fast(m, v, x)
        hyb = apply_fast(m, v, x, s2d_dtype=jnp.bfloat16)
        assert hyb.shape == f32.shape and hyb.dtype == jnp.float32
        # scores (obj*cls max) rank the same cells at the top
        s_f32 = np.asarray(f32[0, :, 4] * f32[0, :, 5:].max(-1))
        s_hyb = np.asarray(hyb[0, :, 4] * hyb[0, :, 5:].max(-1))
        top = np.argsort(s_f32)[-20:]
        assert len(set(top) & set(np.argsort(s_hyb)[-20:])) >= 18
        # the top cells' boxes agree to ~a pixel, scores to 5%
        assert float(np.abs(np.asarray(f32)[0, top, :4]
                            - np.asarray(hyb)[0, top, :4]).max()) < 1.5
        assert float(np.abs(s_f32[top] - s_hyb[top]).max()) < 0.05

    def test_depthwise_falls_back(self):
        rng = np.random.RandomState(5)
        m = Yolox.from_variant("nano")
        x = jnp.asarray(rng.randint(0, 256, (1, 96, 96, 3)).astype(np.uint8))
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        got = apply_fast(m, v, x)
        assert jnp.allclose(ref, got)
