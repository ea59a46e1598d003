"""rsaudioecho: echo/reverb effect element.

Parity target: audio/audiofx/src/audioecho/imp.rs (260 LoC).  Properties
max-delay/delay (ns), intensity, feedback; caps F32/F64 interleaved any
rate/channels; AlwaysInPlace; delay clamped to max-delay at process time
(imp.rs:205-227).  State: delay-line history on device (see ops/echo.py).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...core import (
    AudioFilter,
    AudioInfo,
    Buffer,
    Prop,
    SECOND,
    TransformMode,
    audio_caps_template,
    register,
)
from ...ops.echo import echo_apply_flat, echo_lag_samples, echo_ring_size

_U64_MAX_MINUS_1 = 2**64 - 2


@register
class AudioEcho(AudioFilter):
    ELEMENT_NAME = "rsaudioecho"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Adds an echo or reverb effect to an audio stream"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False

    SINK_CAPS = audio_caps_template(formats=("F32", "F64"))
    SRC_CAPS = audio_caps_template(formats=("F32", "F64"))

    PROPERTIES = [
        Prop("max-delay", SECOND, type="uint64", maximum=_U64_MAX_MINUS_1, mutable="ready",
             doc="Maximum delay of the echo in nanoseconds"),
        Prop("delay", 500 * SECOND, type="uint64", maximum=_U64_MAX_MINUS_1, mutable="playing",
             doc="Delay of the echo in nanoseconds"),
        Prop("intensity", 0.5, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("feedback", 0.0, minimum=0.0, maximum=1.0, mutable="playing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._hist = None

    def setup(self, info: AudioInfo) -> None:
        size = echo_ring_size(self.get_property("max-delay"), info.rate, info.channels)
        if size == 0:
            size = info.channels  # degenerate max-delay < 1 sample
        dtype = jnp.float64 if info.format == "F64" else jnp.float32
        self._hist = jnp.zeros((size,), dtype)

    def stop(self) -> None:
        self._hist = None

    def transform_ip(self, buf: Buffer) -> Buffer:
        info = self.audio_info
        assert info is not None and self._hist is not None
        S = self._hist.shape[0]
        lag = echo_lag_samples(
            self.get_property("delay"), self.get_property("max-delay"), info.rate, info.channels
        )
        # reference ring semantics: delay 0 reads the slot written S samples ago
        lag = S if lag == 0 else min(lag, S)
        frames, ch = buf.data.shape
        flat = buf.data.reshape(frames * ch)
        out, self._hist = echo_apply_flat(
            flat,
            self._hist,
            jnp.asarray(self.get_property("intensity"), self._hist.dtype),
            jnp.asarray(self.get_property("feedback"), self._hist.dtype),
            lag=lag,
        )
        buf.data = out.reshape(frames, ch)
        return buf


__all__ = ["AudioEcho"]
