"""agingradio: old-radio distortion element.

Parity target: audio/audiofx/src/agingradio/imp.rs (347 LoC).  Caps F32/F64
interleaved; per-chunk clicks, white noise, per-channel lowpass, quantization,
cubic distortion.  Deterministic via the `seed` property (the reference uses
a thread RNG and is nondeterministic by design, imp.rs:99).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core import (
    AudioFilter,
    AudioInfo,
    Buffer,
    Prop,
    TransformMode,
    audio_caps_template,
    register,
)
from ...ops.agingradio import agingradio_process, lowpass_alpha


@register
class AgingRadio(AudioFilter):
    ELEMENT_NAME = "agingradio"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Adds age to an audio stream using various kinds of distortion"
    MODE = TransformMode.ALWAYS_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False
    SINK_CAPS = audio_caps_template(formats=("F32", "F64"))
    SRC_CAPS = audio_caps_template(formats=("F32", "F64"))

    PROPERTIES = [
        Prop("white-noise-ampl", 0.011, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("clicks-prob", 1.0 / 100000.0, minimum=0.0, maximum=1.0, mutable="playing"),
        Prop("lowpass-freq", 2000, type="uint", mutable="ready",
             doc="Lowpass cutoff in Hz; 0 disables the filter"),
        Prop("bits-to-quantize", 4.0, minimum=0.0, maximum=32.0, mutable="playing"),
        Prop("cubic-curve-distortion", 1.0, minimum=0.0, maximum=10.0, mutable="playing"),
        Prop("cubic-curve-passes", 3, type="uint", maximum=64, mutable="ready"),
        Prop("seed", 0, type="uint64", mutable="ready", doc="PRNG seed (deterministic)"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._filt_state = None
        self._key = None
        self._alpha = 0.0

    def setup(self, info: AudioInfo) -> None:
        dtype = jnp.float64 if (info.format == "F64" and jax.config.jax_enable_x64) else jnp.float32
        self._filt_state = jnp.zeros((info.channels,), dtype)
        self._key = jax.random.PRNGKey(self.get_property("seed"))
        freq = self.get_property("lowpass-freq")
        self._alpha = lowpass_alpha(info.rate, freq) if freq > 0 else 0.0

    def stop(self) -> None:
        self._filt_state = None
        self._key = None

    def transform_ip(self, buf: Buffer) -> Buffer:
        assert self._filt_state is not None
        self._key, sub = jax.random.split(self._key)
        out, self._filt_state = agingradio_process(
            buf.data,
            sub,
            self._filt_state,
            self.get_property("white-noise-ampl"),
            self.get_property("clicks-prob"),
            self._alpha,
            self.get_property("bits-to-quantize"),
            self.get_property("cubic-curve-distortion"),
            passes=self.get_property("cubic-curve-passes"),
            use_lowpass=self.get_property("lowpass-freq") > 0,
        )
        buf.data = out
        return buf


__all__ = ["AgingRadio"]
