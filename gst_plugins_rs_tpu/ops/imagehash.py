"""Perceptual image hashing (videocompare compute path).

Reimplements the `image_hasher` algorithms the reference uses
(video/videofx/src/videocompare/hashed_image.rs): Mean / Gradient /
VertGradient / DoubleGradient / Blockhash, 64-bit hashes, hamming distance.
Resampling uses jax.image.resize (linear) rather than the crate's Lanczos3 —
hash values are not bit-identical to image_hasher but have the same
discrimination behavior (identical frames -> distance 0).

All hashing runs on device; only the 64-bit vector is read back.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HASH_SIZE = 8


def _to_luma(frame):
    """[H, W, C] uint -> [H, W] f32 luma (Rec.709 coefficients like the
    `image` crate)."""
    f = frame.astype(jnp.float32)
    if f.shape[-1] == 1:
        return f[..., 0]
    return 0.2126 * f[..., 0] + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]


def _resize(luma, h, w):
    return jax.image.resize(luma, (h, w), method="linear")


@partial(jax.jit, static_argnames=("algo",))
def hash_image(frame, *, algo: str):
    """frame: [H, W, C] -> bool bits [64+]."""
    luma = _to_luma(frame)
    if algo == "mean":
        small = _resize(luma, HASH_SIZE, HASH_SIZE)
        bits = small > jnp.mean(small)
    elif algo == "gradient":
        small = _resize(luma, HASH_SIZE, HASH_SIZE + 1)
        bits = small[:, 1:] > small[:, :-1]
    elif algo == "vertgradient":
        small = _resize(luma, HASH_SIZE + 1, HASH_SIZE)
        bits = small[1:, :] > small[:-1, :]
    elif algo == "doublegradient":
        half = HASH_SIZE // 2
        small = _resize(luma, half + 1, half + 1)
        bh = small[:half, 1:] > small[:half, :-1]
        bv = small[1:, :half] > small[:-1, :half]
        bits = jnp.concatenate([bh.ravel(), bv.ravel()])
    elif algo == "blockhash":
        # block median hash over the original image (no resampling)
        H, W = luma.shape
        bh, bw = H // HASH_SIZE, W // HASH_SIZE
        blocks = luma[: bh * HASH_SIZE, : bw * HASH_SIZE]
        sums = blocks.reshape(HASH_SIZE, bh, HASH_SIZE, bw).sum(axis=(1, 3))
        bits = sums > jnp.median(sums)
    else:
        raise ValueError(f"unknown hash algorithm {algo!r}")
    return bits.ravel()


@jax.jit
def hamming(a, b):
    return jnp.sum(a != b)


__all__ = ["hash_image", "hamming", "HASH_SIZE"]
