"""SOFA (AES69) HRTF file loading + uniformly partitioned convolution.

Reimplements the `sofar` crate the reference outsources to (SURVEY.md §2.4;
audio/hrtf/src/sofa/imp.rs): SOFA files are netCDF4/HDF5 containers with
Data.IR [measurements, receivers=2, taps], SourcePosition [measurements, 3]
(azimuth deg, elevation deg, radius m) and Data.SamplingRate.  Filter
selection is nearest-neighbor on the measurement sphere; rendering is
uniformly-partitioned overlap-save convolution (UPOLS: frequency-domain
delay line of partition spectra — one FFT per input partition, one complex
multiply-accumulate over partitions, one inverse FFT), the standard
low-latency long-FIR structure the reference configures with
partition-length 64 (sofa/imp.rs:37-44).

TPU-native: the frequency-domain delay line lives on device; the per-block
update is FFT + batched complex MAC over [partitions] — batched over
channels.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SofaFile:
    rate: float
    ir: np.ndarray  # [M, 2, N]
    positions: np.ndarray  # [M, 3] az(deg), el(deg), r(m)

    @staticmethod
    def from_file(path: str) -> "SofaFile":
        import h5py

        with h5py.File(path, "r") as f:
            ir = np.asarray(f["Data.IR"], np.float32)
            rate = float(np.asarray(f["Data.SamplingRate"]).ravel()[0])
            pos = np.asarray(f["SourcePosition"], np.float64)
        if ir.ndim != 3:
            raise ValueError(f"unexpected Data.IR shape {ir.shape}")
        if ir.shape[1] < 2:
            raise ValueError("SOFA file must have 2 receivers (ears)")
        return SofaFile(rate, ir[:, :2, :], pos)

    def _cartesian(self) -> np.ndarray:
        az = np.deg2rad(self.positions[:, 0])
        el = np.deg2rad(self.positions[:, 1])
        r = self.positions[:, 2]
        x = r * np.cos(el) * np.cos(az)
        y = r * np.cos(el) * np.sin(az)
        z = r * np.sin(el)
        return np.stack([x, y, z], axis=1)

    def nearest(self, point_xyz) -> int:
        """Index of the measurement nearest to a cartesian point."""
        c = self._cartesian()
        d = np.sum((c - np.asarray(point_xyz, np.float64)) ** 2, axis=1)
        return int(np.argmin(d))

    def hrir(self, idx: int) -> np.ndarray:
        return self.ir[idx]  # [2, N]


def partition_filter(h: np.ndarray, part_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """h: [2, N] -> partition spectra (re, im) each [P, 2, part_len+1]
    (rfft of 2L); real pairs because the TPU path avoids complex dtypes."""
    n = h.shape[-1]
    P = max(1, math.ceil(n / part_len))
    padded = np.zeros((2, P * part_len), np.float32)
    padded[:, :n] = h
    parts = padded.reshape(2, P, part_len).transpose(1, 0, 2)  # [P, 2, L]
    H = np.fft.rfft(parts, 2 * part_len, axis=-1)
    return H.real.astype(np.float32), H.imag.astype(np.float32)


@partial(jax.jit, static_argnames=())
def upols_block(fdl_re, fdl_im, prev_block, x_block, H_re, H_im):
    """One partition step of UPOLS (real-pair spectra, see ops/rfft.py).

    fdl_re/fdl_im: [P, L+1] frequency-domain delay line (newest first)
    prev_block: [L] previous input block; x_block: [L] new input samples
    H_re/H_im: [P, 2, L+1] partition spectra
    Returns (fdl_re', fdl_im', prev', out [L, 2])."""
    from .rfft import cmul_pair, irfft_pair, rfft_pair

    L = x_block.shape[0]
    seg = jnp.concatenate([prev_block, x_block])  # [2L] overlap-save input
    Xr, Xi = rfft_pair(seg, 2 * L)  # [L+1]
    fdl_re = jnp.concatenate([Xr[None], fdl_re[:-1]], axis=0)
    fdl_im = jnp.concatenate([Xi[None], fdl_im[:-1]], axis=0)
    Yr, Yi = cmul_pair(fdl_re[:, None, :], fdl_im[:, None, :], H_re, H_im)
    Yr = jnp.sum(Yr, axis=0)  # [2, L+1]
    Yi = jnp.sum(Yi, axis=0)
    y = irfft_pair(Yr, Yi, 2 * L)[:, L:]  # overlap-save: keep last L
    return fdl_re, fdl_im, x_block, y.T  # [L, 2]


__all__ = ["SofaFile", "partition_filter", "upols_block"]
