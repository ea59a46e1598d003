"""audiornnoise: RNNoise denoiser element.

Parity target: audio/audiofx/src/audiornnoise/imp.rs (435 LoC):
AudioFilter/BaseTransform NeverInPlace with generate_output() + adapter
accumulating 480-sample frames; caps F32 interleaved 48 kHz only; per-channel
denoiser state; scale x32767 in, /32767 out; VAD = max over channels, below
`voice-activity-threshold` the output frame is zeroed, vad >= 0.98 sets
has_voice; AudioLevelMeta (RMS->dB byte + has_voice) attached per output
buffer; drains on DISCONT and EOS; latency += 480/48000 s.

The `model` property loads trained weights from an .npz (ops/rnnoise.py);
without it a deterministic random init is used (architecture-exact, see
ops/rnnoise.py docstring).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core import (
    Adapter,
    AudioFilter,
    AudioInfo,
    Buffer,
    BufferFlags,
    Meta,
    Prop,
    SECOND,
    TransformMode,
    audio_caps_template,
    register,
)
from ...ops.rnnoise import (
    FRAME_SIZE,
    default_weights,
    denoise_frames_fast_jit,
    denoise_init,
    load_weights,
)


class AudioLevelMeta(Meta):
    """Audio level meta (gst_audio::AudioLevelMeta analog): level is the
    negative RMS dB as a byte, 0 = loudest."""

    api = "audio-level"

    def __init__(self, level: int, voice_activity: bool):
        self.level = level
        self.voice_activity = voice_activity

    def __repr__(self):
        return f"AudioLevelMeta(level={self.level}, voice={self.voice_activity})"


@register
class AudioRNNoise(AudioFilter):
    ELEMENT_NAME = "audiornnoise"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Removes noise from an audio stream"
    MODE = TransformMode.NEVER_IN_PLACE
    PASSTHROUGH_ON_SAME_CAPS = False
    TRANSFORM_IP_ON_PASSTHROUGH = False

    SINK_CAPS = audio_caps_template(formats=("F32",), rate=48000)
    SRC_CAPS = audio_caps_template(formats=("F32",), rate=48000)

    PROPERTIES = [
        Prop("voice-activity-threshold", 0.0, minimum=0.0, maximum=1.0, mutable="playing",
             doc="Frames with voice activity below are zeroed"),
        Prop("model", None, type="str", mutable="ready", doc=".npz weight file (optional)"),
        Prop("seed", 0, type="uint64", mutable="ready", doc="random-init seed when no model set"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._adapter = Adapter()
        self._dstate = None
        self._weights = None

    def setup(self, info: AudioInfo) -> None:
        self._dstate = denoise_init(info.channels)
        path = self.get_property("model")
        w = load_weights(path) if path else default_weights()
        self._weights = {k: jnp.asarray(v) for k, v in w.items()}
        self._adapter.clear()

    def stop(self) -> None:
        self._dstate = None
        self._weights = None
        self._adapter.clear()

    def latency_additional_ns(self) -> int:
        return FRAME_SIZE * SECOND // 48000

    # ------------------------------------------------------------------
    def _process(self, data):
        """data: [n*FRAME, ch] -> (out [n*FRAME, ch], level, has_voice)."""
        n = data.shape[0] // FRAME_SIZE
        ch = data.shape[1]
        frames = (jnp.asarray(data, jnp.float32) * 32767.0).reshape(n, FRAME_SIZE, ch)
        frames = jnp.transpose(frames, (0, 2, 1))  # [n, C, FRAME]
        self._dstate, outs, vads = denoise_frames_fast_jit(self._dstate, self._weights, frames)
        vad = jnp.max(vads, axis=1)  # [n] max over channels
        out = jnp.transpose(outs, (0, 2, 1)) / 32767.0  # [n, FRAME, ch]
        thr = self.get_property("voice-activity-threshold")
        keep = vad >= thr
        out = jnp.where(keep[:, None, None], out, 0.0)
        has_voice = bool(jnp.any(vad >= 0.98))
        out = out.reshape(n * FRAME_SIZE, ch)
        rms = float(jnp.sum(out * out))
        level = int(np.clip(-20.0 * np.log10(rms + np.finfo(np.float32).eps), 0.0, 255.0))
        return out, level, has_voice

    def submit_input_buffer(self, buf: Buffer) -> None:
        if buf.has_flag(BufferFlags.DISCONT):
            residue = self.drain()
            if residue is not None:
                self.srcpad.push(residue)
        self._adapter.push(buf)

    def generate_output(self) -> Optional[Buffer]:
        info = self.audio_info
        if info is None or self._adapter.available() < FRAME_SIZE:
            return None
        pts, dist = self._adapter.prev_pts()
        n = (self._adapter.available() // FRAME_SIZE) * FRAME_SIZE
        data = self._adapter.take(n)
        out, level, has_voice = self._process(data)
        out_pts = None if pts is None else pts + dist * SECOND // info.rate
        buf = Buffer(out, pts=out_pts, duration=n * SECOND // info.rate)
        buf.add_meta(AudioLevelMeta(level, has_voice))
        return buf

    def drain(self) -> Optional[Buffer]:
        info = self.audio_info
        avail = self._adapter.available()
        if info is None or avail == 0:
            return None
        pts, dist = self._adapter.prev_pts()
        data = np.zeros((FRAME_SIZE, info.channels), np.float32)
        taken = np.asarray(self._adapter.take(avail))
        data[:avail] = taken
        out, level, has_voice = self._process(data)
        out = out[:avail]
        out_pts = None if pts is None else pts + dist * SECOND // info.rate
        buf = Buffer(out, pts=out_pts, duration=avail * SECOND // info.rate)
        buf.add_meta(AudioLevelMeta(level, has_voice))
        return buf


__all__ = ["AudioRNNoise", "AudioLevelMeta"]
