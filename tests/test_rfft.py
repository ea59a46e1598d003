"""Real-pair DFT tests: the matmul fallback must match numpy FFT exactly
enough for the spectral elements (the axon TPU relay rejects XLA FFT ops)."""
import numpy as np
import pytest

import gst_plugins_rs_tpu.ops.rfft as R


@pytest.fixture()
def force_matmul(monkeypatch):
    monkeypatch.setattr(R, "fft_supported", lambda: False)


@pytest.mark.parametrize("n", [16, 32, 960, 1024])
def test_rfft_pair_matches_numpy(force_matmul, n):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    re, im = R.rfft_pair(x, n)
    ref = np.fft.rfft(x, n, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3 * n / 16)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3 * n / 16)


@pytest.mark.parametrize("n", [16, 960, 1024])
def test_roundtrip(force_matmul, n):
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, n)).astype(np.float32)
    re, im = R.rfft_pair(x, n)
    y = R.irfft_pair(re, im, n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_odd_padding(force_matmul):
    x = np.ones((50,), np.float32)
    re, im = R.rfft_pair(x, 64)
    ref = np.fft.rfft(x, 64)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-3)


def test_cmul_pair():
    a = np.random.RandomState(2).uniform(-1, 1, (4, 2))
    b = np.random.RandomState(3).uniform(-1, 1, (4, 2))
    ca = a[:, 0] + 1j * a[:, 1]
    cb = b[:, 0] + 1j * b[:, 1]
    re, im = R.cmul_pair(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
    np.testing.assert_allclose(np.asarray(re), (ca * cb).real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), (ca * cb).imag, atol=1e-12)
