"""HRTF binaural rendering: HRIR sphere + block FFT convolution.

Reimplements the `hrtf` crate (0.8.1) the reference outsources to
(SURVEY.md §2.4): the HRIR sphere file format (magic "HRIR", rate, hrir_len,
vertex/index counts, triangle indices, vertices as xyz + left/right IRs —
verified against audio/hrtf/tests/test.hrir) and block convolution with
positional interpolation (HrtfProcessor: a 4096-sample block is cut into
`interpolation_steps` segments; each segment is convolved with the HRIR
bilinearly interpolated on the sphere at the position lerped from prev to new,
with distance gain lerped alongside).

TPU-native split: HRIR interpolation happens host-side (positions are
properties; a handful of 370-triangle ray tests per block), while the
segmented convolution runs on device as batched FFT multiplies — channels and
interpolation steps are batch dims (replacing the reference's optional rayon
per-channel threads, audio/hrtf/src/hrtf/imp.rs:237-253).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class HrirSphere:
    rate: int
    length: int  # HRIR taps
    vertices: np.ndarray  # [V, 3]
    faces: np.ndarray  # [F, 3] int
    left: np.ndarray  # [V, L]
    right: np.ndarray  # [V, L]

    @staticmethod
    def parse(data: bytes, target_rate: int) -> "HrirSphere":
        if data[:4] != b"HRIR":
            raise ValueError("not an HRIR sphere file (bad magic)")
        rate, length, vcount, icount = struct.unpack_from("<IIII", data, 4)
        if icount % 3 != 0:
            raise ValueError("index count not a multiple of 3")
        off = 20
        faces = np.frombuffer(data, "<u4", icount, off).reshape(-1, 3).astype(np.int64)
        off += icount * 4
        verts = np.zeros((vcount, 3), np.float32)
        left = np.zeros((vcount, length), np.float32)
        right = np.zeros((vcount, length), np.float32)
        stride = 12 + 2 * length * 4
        for v in range(vcount):
            verts[v] = np.frombuffer(data, "<f4", 3, off)
            left[v] = np.frombuffer(data, "<f4", length, off + 12)
            right[v] = np.frombuffer(data, "<f4", length, off + 12 + length * 4)
            off += stride
        sphere = HrirSphere(rate, length, verts, faces, left, right)
        if rate != target_rate:
            sphere = sphere.resampled(target_rate)
        return sphere

    @staticmethod
    def from_file(path: str, target_rate: int) -> "HrirSphere":
        with open(path, "rb") as f:
            return HrirSphere.parse(f.read(), target_rate)

    def resampled(self, new_rate: int) -> "HrirSphere":
        """Linear-resample the IRs to the device rate (the crate resamples on
        load as well; linear is a documented approximation)."""
        new_len = max(1, int(round(self.length * new_rate / self.rate)))
        t_old = np.arange(self.length) * (1.0 / self.rate)
        t_new = np.arange(new_len) * (1.0 / new_rate)
        left = np.stack([np.interp(t_new, t_old, ir) for ir in self.left]).astype(np.float32)
        right = np.stack([np.interp(t_new, t_old, ir) for ir in self.right]).astype(np.float32)
        return HrirSphere(new_rate, new_len, self.vertices, self.faces, left, right)

    def sample_bilinear(self, direction: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Interpolate (left, right) HRIRs at a direction via ray-triangle
        barycentric blending over the sphere mesh; nearest vertex fallback."""
        d = np.asarray(direction, np.float64)
        n = np.linalg.norm(d)
        if n < 1e-9:
            d = np.array([0.0, 0.0, 1.0])
        else:
            d = d / n
        a = self.vertices[self.faces[:, 0]].astype(np.float64)
        b = self.vertices[self.faces[:, 1]].astype(np.float64)
        c = self.vertices[self.faces[:, 2]].astype(np.float64)
        # Moller-Trumbore, ray from origin along d
        e1 = b - a
        e2 = c - a
        p = np.cross(d, e2)
        det = np.einsum("ij,ij->i", e1, p)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
            t0 = -a  # origin - a
            u = np.einsum("ij,ij->i", t0, p) * inv
            q = np.cross(t0, e1)
            v = np.einsum("j,ij->i", d, q) * inv
            t = np.einsum("ij,ij->i", e2, q) * inv
        eps = 1e-6
        hit = (np.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (t > 0)
        if not np.any(hit):
            # fallback: nearest vertex
            iv = int(np.argmax(self.vertices @ d))
            return self.left[iv], self.right[iv]
        fi = int(np.argmax(hit))
        w1, w2 = u[fi], v[fi]
        w0 = 1.0 - w1 - w2
        f = self.faces[fi]
        l = w0 * self.left[f[0]] + w1 * self.left[f[1]] + w2 * self.left[f[2]]
        r = w0 * self.right[f[0]] + w1 * self.right[f[1]] + w2 * self.right[f[2]]
        return l.astype(np.float32), r.astype(np.float32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("block_len", "steps"))
def hrtf_convolve_block(x, hrirs, gains, tails, *, block_len: int, steps: int):
    """Convolve one multi-channel block with per-step interpolated HRIRs.

    x:     [C, steps*block_len] deinterleaved input
    hrirs: [C, steps, 2, L] left/right IRs per channel per step
    gains: [C, steps] distance gains (applied to the input segment)
    tails: [C, 2, L-1] overlap-add carry per channel
    Returns (out [steps*block_len, 2] mixed over channels, new tails)."""
    C = x.shape[0]
    L = hrirs.shape[-1]
    B = block_len
    n = steps * B
    fft_len = _next_pow2(B + L - 1)

    from .rfft import cmul_pair, irfft_pair, rfft_pair

    segs = x.reshape(C, steps, B) * gains[:, :, None]  # [C, S, B]
    Xr, Xi = rfft_pair(segs, fft_len)  # [C, S, F]
    Hr, Hi = rfft_pair(hrirs, fft_len)  # [C, S, 2, F]
    Yr, Yi = cmul_pair(Xr[:, :, None, :], Xi[:, :, None, :], Hr, Hi)  # [C, S, 2, F]
    y = irfft_pair(Yr, Yi, fft_len)[..., : B + L - 1]  # [C, S, 2, B+L-1]

    # overlap-add across steps: place each segment at offset s*B
    full = jnp.zeros((C, 2, n + L - 1), y.dtype)
    for s in range(steps):
        full = full.at[:, :, s * B : s * B + B + L - 1].add(y[:, s])
    full = full.at[:, :, : L - 1].add(tails) if L > 1 else full
    out = jnp.sum(full[:, :, :n], axis=0)  # mix channels -> [2, n]
    new_tails = full[:, :, n:]
    return out.T, new_tails  # [n, 2]


@partial(jax.jit, static_argnames=("block_len", "steps"))
def hrtf_convolve_blocks(x, hrirs, gains, tails, *, block_len: int, steps: int):
    """Convolve K queued blocks in ONE dispatch (lax.scan over blocks,
    chaining the overlap-add tails).  Bit-equal to K sequential
    hrtf_convolve_block calls; amortizes per-dispatch latency the same way
    loudnorm's inner_frames_scan does for 100 ms frames.

    x: [C, K, steps*block_len] -> (out [K, steps*block_len, 2], tails)."""

    def body(tails, xk):
        out, tails = hrtf_convolve_block(
            xk, hrirs, gains, tails, block_len=block_len, steps=steps)
        return tails, out

    new_tails, outs = jax.lax.scan(body, tails, jnp.moveaxis(x, 1, 0))
    return outs, new_tails


__all__ = ["HrirSphere", "hrtf_convolve_block", "hrtf_convolve_blocks"]
