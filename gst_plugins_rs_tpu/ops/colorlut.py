"""Adobe .cube LUT parsing and 1D/3D LUT color-grade kernels.

Reference: video/colorlut/src/parser.rs (grammar: TITLE / DOMAIN_MIN /
DOMAIN_MAX / LUT_1D_SIZE 2..=65536 / LUT_3D_SIZE 2..=256; header-after-data
rejected; 3D layout [x + y*size + z*size^2] with x indexed by R) and the
sampling in colorlut/imp.rs:399-543 (domain normalize -> clamp -> linear /
trilinear interpolation -> round-to-nearest quantization).

TPU-native design: trilinear sampling as 8 vectorized gathers from the flat
LUT + fused lerps — one XLA program per frame batch; the whole LUT is small
enough (<=256^3 worst case, typically 33^3 ~ 575 KB) to live in VMEM.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LUT_1D_MIN_SIZE, LUT_1D_MAX_SIZE = 2, 65536
LUT_3D_MIN_SIZE, LUT_3D_MAX_SIZE = 2, 256


class CubeParseError(ValueError):
    pass


@dataclass
class CubeLut:
    domain_scale: np.ndarray  # [3] f32
    domain_offset: np.ndarray  # [3] f32
    is_3d: bool
    size: int
    # 1D: table [size, 3]; 3D: flat [size^3, 3] in [x + y*s + z*s^2] order
    table: np.ndarray

    @staticmethod
    def parse(text: str) -> "CubeLut":
        domain_min = np.zeros(3, np.float32)
        domain_max = np.ones(3, np.float32)
        state = "header"  # header | 1d | 3d
        size = 0
        have_data = False
        values: List[List[float]] = []

        def err(line_no, line, msg="Invalid line"):
            raise CubeParseError(f"{msg} at line {line_no}: {line}")

        for idx, raw in enumerate(text.splitlines()):
            line_no = idx + 1
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            first = parts[0]
            if first in ("TITLE", "DOMAIN_MIN", "DOMAIN_MAX", "LUT_1D_SIZE", "LUT_3D_SIZE"):
                if have_data:
                    err(line_no, line, "Header found after LUT data")
            if first == "TITLE":
                continue
            elif first in ("DOMAIN_MIN", "DOMAIN_MAX"):
                if len(parts) != 4:
                    err(line_no, line)
                try:
                    vec = np.array([float(v) for v in parts[1:]], np.float32)
                except ValueError:
                    err(line_no, line, "Invalid float")
                if first == "DOMAIN_MIN":
                    domain_min = vec
                else:
                    domain_max = vec
            elif first in ("LUT_1D_SIZE", "LUT_3D_SIZE"):
                if state != "header":
                    err(line_no, line, f"Invalid {first}")
                if len(parts) != 2:
                    err(line_no, line)
                try:
                    size = int(parts[1])
                except ValueError:
                    err(line_no, line, "Invalid integer")
                lo, hi = (
                    (LUT_1D_MIN_SIZE, LUT_1D_MAX_SIZE)
                    if first == "LUT_1D_SIZE"
                    else (LUT_3D_MIN_SIZE, LUT_3D_MAX_SIZE)
                )
                if not lo <= size <= hi:
                    err(line_no, line, f"Invalid LUT size {size}, expected {lo}..={hi}")
                state = "1d" if first == "LUT_1D_SIZE" else "3d"
            else:
                if state == "header":
                    err(line_no, line, "LUT data found before LUT size")
                if len(parts) != 3:
                    err(line_no, line)
                try:
                    values.append([float(v) for v in parts])
                except ValueError:
                    err(line_no, line, "Invalid float")
                have_data = True

        if np.any(domain_min >= domain_max):
            raise CubeParseError(f"Invalid domain min {domain_min}, max {domain_max}")
        if state == "header":
            raise CubeParseError("Missing LUT size")
        expected = size if state == "1d" else size**3
        if len(values) != expected:
            raise CubeParseError(
                f"Invalid {'1D' if state == '1d' else '3D'} LUT value count, "
                f"expected {expected}, got {len(values)}"
            )
        scale = (1.0 / (domain_max - domain_min)).astype(np.float32)
        offset = (-domain_min * scale).astype(np.float32)
        return CubeLut(
            domain_scale=scale,
            domain_offset=offset,
            is_3d=(state == "3d"),
            size=size,
            table=np.asarray(values, np.float32),
        )

    @staticmethod
    def parse_file(path: str) -> "CubeLut":
        with open(path, "r") as f:
            return CubeLut.parse(f.read())


def _norm(v, scale, offset, size):
    return jnp.clip(v * scale + offset, 0.0, 1.0) * (size - 1.0)


@partial(jax.jit, static_argnames=("size", "offsets", "bits"))
def lut1d_apply(frame, table, scale, offset, *, size: int, offsets: Tuple[int, int, int], bits: int):
    """Per-component linear 1D LUT. frame [..., C] uint; table [size, 3]."""
    maxval = float(2**bits - 1)
    dtype = frame.dtype
    out = frame
    for comp, off in enumerate(offsets):
        v = frame[..., off].astype(jnp.float32) / maxval
        x = _norm(v, scale[comp], offset[comp], size)
        x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), size - 1)
        x1 = jnp.minimum(x0 + 1, size - 1)
        t = x - x0.astype(jnp.float32)
        col = table[:, comp]
        y = col[x0] + (col[x1] - col[x0]) * t
        q = jnp.round(jnp.clip(y, 0.0, 1.0) * maxval).astype(dtype)
        out = out.at[..., off].set(q)
    return out


def pack_corner_table(table: np.ndarray, size: int) -> np.ndarray:
    """Precompute, per 3D cell index, all 8 corner RGB values as one row.

    TPU gathers run at ~1 element/cycle, so the naive 8 scattered gathers per
    pixel are latency-bound.  Packing the 8 corners (with the reference's
    x1=min(x0+1,size-1) clamping baked in) into one [size^3, 24] row turns
    sampling into a single wide-row gather per pixel — bandwidth-bound
    instead of gather-op-bound.  Row layout: corners ordered
    (z1,y1,x1) bits = (0..7), each corner 3 floats RGB."""
    t = table.reshape(size, size, size, 3)  # [z, y, x, 3] flat order x fastest
    # build clamped shifted views
    def sh(a, axis):
        idx = np.minimum(np.arange(size) + 1, size - 1)
        return np.take(a, idx, axis=axis)

    corners = []
    for zb in (0, 1):
        for yb in (0, 1):
            for xb in (0, 1):
                c = t
                if zb:
                    c = sh(c, 0)
                if yb:
                    c = sh(c, 1)
                if xb:
                    c = sh(c, 2)
                corners.append(c)
    packed = np.stack(corners, axis=3)  # [z, y, x, 8, 3]
    return packed.reshape(size**3, 24).astype(np.float32)


@partial(jax.jit, static_argnames=("size", "offsets", "bits"))
def lut3d_apply_packed(
    frame, packed, scale, offset, *, size: int, offsets: Tuple[int, int, int], bits: int
):
    """Trilinear 3D LUT via the packed corner table (one gather per pixel).

    packed: [size^3, 24] from pack_corner_table. Bit-identical lerp order to
    lut3d_apply / the reference (imp.rs:494-534)."""
    maxval = float(2**bits - 1)
    dtype = frame.dtype
    r = frame[..., offsets[0]].astype(jnp.float32) / maxval
    g = frame[..., offsets[1]].astype(jnp.float32) / maxval
    b = frame[..., offsets[2]].astype(jnp.float32) / maxval

    x = _norm(r, scale[0], offset[0], size)
    y = _norm(g, scale[1], offset[1], size)
    z = _norm(b, scale[2], offset[2], size)

    def fl(v):
        v0 = jnp.minimum(jnp.floor(v).astype(jnp.int32), size - 1)
        return v0, v - v0.astype(jnp.float32)

    x0, tx = fl(x)
    y0, ty = fl(y)
    z0, tz = fl(z)

    # bf16 tables (precision=fast) halve the gathered row bytes: measured
    # 138 vs 102 fps at 1080p 33^3, max 1 u8 LSB delta (PERF_NOTES.md)
    rows = packed[x0 + y0 * size + z0 * size * size].astype(jnp.float32)  # [..., 24]
    c = rows.reshape(rows.shape[:-1] + (8, 3))
    tx = tx[..., None]
    ty = ty[..., None]
    tz = tz[..., None]
    c00 = c[..., 0, :] + (c[..., 1, :] - c[..., 0, :]) * tx
    c10 = c[..., 2, :] + (c[..., 3, :] - c[..., 2, :]) * tx
    c01 = c[..., 4, :] + (c[..., 5, :] - c[..., 4, :]) * tx
    c11 = c[..., 6, :] + (c[..., 7, :] - c[..., 6, :]) * tx
    c0 = c00 + (c10 - c00) * ty
    c1 = c01 + (c11 - c01) * ty
    cc = c0 + (c1 - c0) * tz

    out = frame
    for comp, off in enumerate(offsets):
        q = jnp.round(jnp.clip(cc[..., comp], 0.0, 1.0) * maxval).astype(dtype)
        out = out.at[..., off].set(q)
    return out


# Above this size the packed table gets large (size^3 * 96 B); 65^3 ~ 26 MB.
PACKED_TABLE_MAX_SIZE = 65


@partial(jax.jit, static_argnames=("size", "offsets", "bits"))
def lut3d_apply(frame, table, scale, offset, *, size: int, offsets: Tuple[int, int, int], bits: int):
    """Trilinear 3D LUT grade; alpha/extra channels preserved.

    frame: [..., C] uint8/uint16; table: [size^3, 3] flat in
    [x + y*size + z*size^2] layout (x indexed by R)."""
    maxval = float(2**bits - 1)
    dtype = frame.dtype
    r = frame[..., offsets[0]].astype(jnp.float32) / maxval
    g = frame[..., offsets[1]].astype(jnp.float32) / maxval
    b = frame[..., offsets[2]].astype(jnp.float32) / maxval

    x = _norm(r, scale[0], offset[0], size)
    y = _norm(g, scale[1], offset[1], size)
    z = _norm(b, scale[2], offset[2], size)

    def fl(v):
        v0 = jnp.minimum(jnp.floor(v).astype(jnp.int32), size - 1)
        return v0, jnp.minimum(v0 + 1, size - 1), v - v0.astype(jnp.float32)

    x0, x1, tx = fl(x)
    y0, y1, ty = fl(y)
    z0, z1, tz = fl(z)

    def at(xi, yi, zi):
        return table[xi + yi * size + zi * size * size]

    tx = tx[..., None]
    ty = ty[..., None]
    tz = tz[..., None]
    c00 = at(x0, y0, z0) + (at(x1, y0, z0) - at(x0, y0, z0)) * tx
    c10 = at(x0, y1, z0) + (at(x1, y1, z0) - at(x0, y1, z0)) * tx
    c01 = at(x0, y0, z1) + (at(x1, y0, z1) - at(x0, y0, z1)) * tx
    c11 = at(x0, y1, z1) + (at(x1, y1, z1) - at(x0, y1, z1)) * tx
    c0 = c00 + (c10 - c00) * ty
    c1 = c01 + (c11 - c01) * ty
    c = c0 + (c1 - c0) * tz

    out = frame
    for comp, off in enumerate(offsets):
        q = jnp.round(jnp.clip(c[..., comp], 0.0, 1.0) * maxval).astype(dtype)
        out = out.at[..., off].set(q)
    return out


__all__ = [
    "CubeLut",
    "CubeParseError",
    "lut1d_apply",
    "lut3d_apply",
    "lut3d_apply_packed",
    "pack_corner_table",
    "PACKED_TABLE_MAX_SIZE",
]
