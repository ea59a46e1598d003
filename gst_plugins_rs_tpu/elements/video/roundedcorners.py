"""roundedcorners: adds an alpha plane with rounded corners (I420 -> A420).

Parity target: video/videofx/src/border/imp.rs (573 LoC): sink I420, src
I420 (radius 0) or A420; the alpha mask is regenerated only when the radius
or caps change (imp.rs:108-133, 460-505).  The reference draws the mask with
cairo; here it is a rounded-rect signed-distance field evaluated on device
(antialiased edge), cached per (size, radius).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...core import (
    Buffer,
    Caps,
    PadDirection,
    Prop,
    TransformMode,
    ValueList,
    VideoFilter,
    register,
)
from ...core.caps import IntRange, Structure


def _planar_caps(formats) -> Caps:
    fields = {
        "format": formats[0] if len(formats) == 1 else ValueList(formats),
        "width": IntRange(1, 32768),
        "height": IntRange(1, 32768),
    }
    return Caps([Structure("video/x-raw", **fields)])


@partial(jax.jit, static_argnames=("h", "w", "radius"))
def rounded_alpha_mask(*, h: int, w: int, radius: int):
    """[h, w] uint8 alpha: opaque inside the rounded rect, antialiased edge
    (rounded-rect SDF; visually equivalent to the reference's cairo path)."""
    if radius == 0:
        return jnp.full((h, w), 255, jnp.uint8)
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    x = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    r = float(radius)
    # distance from each pixel to the rounded-rect interior
    cx = jnp.clip(x, r, w - r)
    cy = jnp.clip(y, r, h - r)
    d = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2) - r
    alpha = jnp.clip(0.5 - d, 0.0, 1.0) * 255.0
    return alpha.astype(jnp.int32).astype(jnp.uint8)


@register
class RoundedCorners(VideoFilter):
    ELEMENT_NAME = "roundedcorners"
    ELEMENT_CLASS = "Filter/Effect/Video"
    ELEMENT_DESCRIPTION = "Adds rounded corners to video via an alpha plane"
    MODE = TransformMode.NEVER_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = _planar_caps(("I420",))
    SRC_CAPS = _planar_caps(("I420", "A420"))

    PROPERTIES = [
        Prop("border-radius-px", 0, type="uint", mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._mask = None
        self._mask_key: Optional[Tuple[int, int, int]] = None

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_: Optional[Caps]) -> Caps:
        out = caps.copy()
        if out.is_any():
            out = (self.SRC_CAPS if direction == PadDirection.SINK else self.SINK_CAPS).copy()
        for s in out.structures:
            if direction == PadDirection.SRC:
                s["format"] = "I420"
            else:
                # radius 0 may stay I420; otherwise alpha is required
                if self.get_property("border-radius-px") == 0:
                    s["format"] = ValueList(("I420", "A420"))
                else:
                    s["format"] = "A420"
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def _get_mask(self, h: int, w: int):
        radius = self.get_property("border-radius-px")
        key = (h, w, radius)
        if self._mask_key != key:
            self._mask = rounded_alpha_mask(h=h, w=w, radius=radius)
            self._mask_key = key
        return self._mask

    def transform(self, inbuf: Buffer) -> Buffer:
        out_info = self.out_video_info
        assert out_info is not None
        planes = inbuf.data if isinstance(inbuf.data, tuple) else (inbuf.data,)
        if out_info.format == "I420":
            out = Buffer(planes)
        else:
            y = planes[0]
            alpha = self._get_mask(int(y.shape[0]), int(y.shape[1]))
            out = Buffer(planes[:3] + (alpha,))
        out.copy_metadata_from(inbuf)
        return out


__all__ = ["RoundedCorners", "rounded_alpha_mask"]
