"""Demucs music source separation (time-domain v2 architecture) in flax.

Parity target: audio/demucs (the reference element delegates inference to
an external session loading Meta's pretrained htdemucs models,
demucs/imp.rs:417-660 — the network itself is not in the reference repo
either).  Here the classic time-domain Demucs architecture (Defossez et
al., arXiv:1911.13254) is implemented natively: conv encoder with GLU
activations, BiLSTM bottleneck, transposed-conv decoder with U-Net skips,
one waveform head per source.  The hybrid-transformer variant (htdemucs)
is not implemented yet; pretrained weights are not redistributable, so
models initialize randomly and `load_npz` imports converted weights (the
rnnoise approach, STATUS.md).

TPU-native notes: inference is jitted over [batch, time, channels] blocks
(channels-last so convs map to MXU), and the element batches fixed-size
segments per dispatch — the relay punishes chained small dispatches
([[axon-tpu-relay-gotchas]] memory).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SOURCES = ("drums", "bass", "other", "vocals")


@dataclass
class DemucsConfig:
    sources: Tuple[str, ...] = SOURCES
    audio_channels: int = 2
    channels: int = 64  # first encoder width (v2 default 64; tests shrink this)
    depth: int = 6
    kernel_size: int = 8
    stride: int = 4
    lstm_layers: int = 2
    growth: float = 2.0

    def valid_length(self, length: int) -> int:
        """Smallest input length >= `length` the stride tree reconstructs
        exactly (mirrors demucs.utils.valid_length)."""
        for _ in range(self.depth):
            length = -(-max(length, 1) // self.stride) + self.kernel_size - self.stride
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        return int(length)


class _BiLSTM(nn.Module):
    hidden: int
    layers: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        for _ in range(self.layers):
            fwd = nn.RNN(nn.LSTMCell(self.hidden))(x)
            bwd = nn.RNN(nn.LSTMCell(self.hidden), reverse=True, keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.hidden)(x)


class Demucs(nn.Module):
    config: DemucsConfig

    @nn.compact
    def __call__(self, mix):  # [B, T, audio_channels] -> [B, S, T, audio_channels]
        cfg = self.config
        mono_ref = mix.mean(axis=-1, keepdims=True)
        std = mono_ref.std(axis=1, keepdims=True) + 1e-5
        x = mix / std

        skips: List[jnp.ndarray] = []
        ch = cfg.channels
        for i in range(cfg.depth):
            x = nn.Conv(ch, (cfg.kernel_size,), strides=(cfg.stride,), padding="VALID")(x)
            x = nn.relu(x)
            x = nn.Conv(2 * ch, (1,))(x)
            x = nn.glu(x, axis=-1)
            skips.append(x)
            ch = int(ch * cfg.growth)
        ch = int(ch / cfg.growth)

        x = _BiLSTM(hidden=ch, layers=cfg.lstm_layers)(x)

        for i in range(cfg.depth):
            x = x + skips.pop()
            x = nn.Conv(2 * ch, (3,), padding="SAME")(x)
            x = nn.glu(x, axis=-1)
            last = i == cfg.depth - 1
            out_ch = (
                len(cfg.sources) * cfg.audio_channels
                if last
                else int(ch / cfg.growth)
            )
            x = nn.ConvTranspose(
                out_ch, (cfg.kernel_size,), strides=(cfg.stride,), padding="VALID"
            )(x)
            if not last:
                x = nn.relu(x)
                ch = out_ch

        b, t, _ = x.shape
        x = x.reshape(b, t, len(cfg.sources), cfg.audio_channels)
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, S, T, C]
        return x * std[:, None]


def init_params(config: DemucsConfig, seed: int = 0):
    model = Demucs(config)
    dummy = jnp.zeros((1, config.valid_length(1024), config.audio_channels), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)


def make_apply(config: DemucsConfig):
    model = Demucs(config)
    return jax.jit(lambda params, mix: model.apply(params, mix))


def save_npz(path: str, params) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_npz(path: str, config: DemucsConfig):
    """Load parameters saved by save_npz into the config's structure."""
    data = np.load(path)
    template = init_params(config)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"missing parameter {key}")
        arr = data[key]
        if arr.shape != v.shape:
            raise ValueError(f"{key}: shape {arr.shape} != expected {v.shape}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


__all__ = ["Demucs", "DemucsConfig", "SOURCES", "init_params", "make_apply",
           "save_npz", "load_npz"]
