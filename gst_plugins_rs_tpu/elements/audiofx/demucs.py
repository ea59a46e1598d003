"""demucs: music source separation element with one src pad per stem.

Parity target: audio/demucs (demucs/imp.rs: sink pad + per-source src pads
named src_<source>, model-name property, ~latency of one segment;
imp.rs:630-700 create_pads).  The reference downloads Meta's pretrained
models and runs them in an external inference session; here the network is
the in-repo flax Demucs (models/demucs.py) — architecture-native, randomly
initialized unless a converted weights file is supplied via `weights`
(pretrained htdemucs weights are not redistributable; model-name=htdemucs
is therefore rejected with a clear error).

Segmented inference: the element accumulates `segment-duration` of audio,
pads to the stride-tree valid length, runs one jitted dispatch per segment
batch, and trims the padding — keeping the relay-friendly
many-samples-per-dispatch shape (PERF_NOTES.md).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ...core import (
    Buffer,
    Caps,
    Element,
    Event,
    EventType,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    SECOND,
    audio_caps_template,
    register,
)
from ...core.audio import AudioInfo
from ...core.events import Segment
from ...models import demucs as demucs_model

_MODEL_CONFIGS = {
    # reference default is htdemucs (hybrid transformer) — not implemented;
    # "demucs" is the published v2 time-domain size, "demucs-lite" a small
    # variant that keeps tests/random-weight runs fast
    "demucs": dict(channels=64, depth=6, lstm_layers=2),
    "demucs-lite": dict(channels=16, depth=4, lstm_layers=1),
}


@register
class Demucs(Element):
    ELEMENT_NAME = "demucs"
    EXTRA_PAD_TEMPLATES = [
        ('src_%s', 'src', 'always', 'audio/x-raw'),
    ]
    ELEMENT_CLASS = "Filter/Audio"
    ELEMENT_DESCRIPTION = "Music source separation (drums/bass/other/vocals)"
    PROPERTIES = [
        Prop("model-name", "demucs-lite", type="enum",
             choices=["demucs", "demucs-lite", "htdemucs"]),
        Prop("segment-duration", SECOND, type="uint64", minimum=100_000_000,
             doc="audio per inference dispatch"),
        Prop("chunk-duration", SECOND, type="uint64", minimum=100_000_000,
             doc="reference name for segment-duration (kept in sync)"),
        Prop("overlap", 0.0, type="float", minimum=0.0, maximum=0.9,
             doc="fraction of each chunk re-processed with the next one "
                 "(accepted; this pipeline processes disjoint chunks — "
                 "overlap-add crossfading is not implemented)"),
        Prop("processing-latency", 0, type="uint64",
             doc="(read) ns of latency the chunking introduces"),
        Prop("url", None, type="str",
             doc="pretrained checkpoint URL (gated: no egress in this "
                 "environment; in-repo demucs-lite weights load by default)"),
        Prop("weights", None, type="str", doc="npz from models.demucs.save_npz"),
        Prop("seed", 0, type="uint"),
    ]

    def property_changed(self, name, value) -> None:
        if name == "chunk-duration":
            self._props["segment-duration"] = value
        elif name == "segment-duration":
            self._props["chunk-duration"] = value

    def get_property(self, name: str):
        if name == "processing-latency":
            return super().get_property("segment-duration")
        return super().get_property(name)

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        sink_caps = audio_caps_template(formats=("F32",), channels=2)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, sink_caps))
        )
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self.src_pads_by_source = {}
        for source in demucs_model.SOURCES:
            pad = Pad(f"src_{source}", PadDirection.SRC,
                      PadTemplate(f"src_{source}", PadDirection.SRC,
                                  PadPresence.ALWAYS, sink_caps))
            self.add_pad(pad)
            self.src_pads_by_source[source] = pad
        self._params = None
        self._apply = None
        self._config: Optional[demucs_model.DemucsConfig] = None
        self._info: Optional[AudioInfo] = None
        self._acc: List[np.ndarray] = []
        self._acc_len = 0
        self._out_pos = 0
        self._started = False

    # -- setup -------------------------------------------------------------------
    def on_ready_to_paused(self) -> None:
        name = self.get_property("model-name")
        if name == "htdemucs":
            raise RuntimeError(
                "htdemucs (hybrid transformer) is not implemented; pretrained "
                "weights are not redistributable in this environment — use "
                "model-name=demucs with converted weights"
            )
        self._config = demucs_model.DemucsConfig(**_MODEL_CONFIGS[name])
        weights = self.get_property("weights")
        if not weights and name == "demucs-lite":
            # packaged weights trained in-repo on synthetic stems
            # (models/demucs_train.py), the rnnoise default_weights analog
            import os

            packaged = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), "data",
                "demucs_lite_weights.npz")
            if os.path.exists(packaged):
                weights = packaged
        if weights:
            self._params = demucs_model.load_npz(weights, self._config)
        else:
            self._params = demucs_model.init_params(
                self._config, self.get_property("seed")
            )
        self._apply = demucs_model.make_apply(self._config)
        self._acc = []
        self._acc_len = 0
        self._out_pos = 0
        self._started = False

    def on_paused_to_ready(self) -> None:
        self._params = None
        self._apply = None
        self._info = None

    # -- helpers ------------------------------------------------------------------
    def _segment_samples(self) -> int:
        assert self._info is not None
        return self.get_property("segment-duration") * self._info.rate // SECOND

    def _start_outputs(self, caps: Caps) -> None:
        if self._started:
            return
        self._started = True
        for source, pad in self.src_pads_by_source.items():
            if pad.peer is None:
                continue
            pad.push_event(Event.new_stream_start(f"{self.name}-{source}"))
            pad.push_event(Event.new_caps(caps))
            pad.push_event(Event.new_segment(Segment()))

    def _process(self, chunk: np.ndarray) -> None:
        """chunk: [T, C] -> push one buffer per stem."""
        cfg = self._config
        t = chunk.shape[0]
        valid = cfg.valid_length(t)
        padded = np.zeros((1, valid, chunk.shape[1]), np.float32)
        padded[0, :t] = chunk
        stems = np.asarray(self._apply(self._params, jnp.asarray(padded)))[0, :, :t]
        pts = self._out_pos * SECOND // self._info.rate
        dur = t * SECOND // self._info.rate
        for si, source in enumerate(self._config.sources):
            pad = self.src_pads_by_source[source]
            if pad.peer is not None:
                pad.push(Buffer(stems[si], pts=pts, duration=dur))
        self._out_pos += t

    def _drain_full(self, final: bool) -> None:
        seg = self._segment_samples()
        data = np.concatenate(self._acc, axis=0) if self._acc else np.zeros((0, 2), np.float32)
        self._acc = []
        pos = 0
        while data.shape[0] - pos >= seg:
            self._process(data[pos : pos + seg])
            pos += seg
        rest = data[pos:]
        if final and rest.shape[0]:
            self._process(rest)
        elif rest.shape[0]:
            self._acc = [rest]
        self._acc_len = sum(a.shape[0] for a in self._acc)

    # -- dataflow --------------------------------------------------------------
    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        arr = np.asarray(buf.data, np.float32)
        self._acc.append(arr)
        self._acc_len += arr.shape[0]
        if self._acc_len >= self._segment_samples():
            self._drain_full(final=False)
        return FlowReturn.OK

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.CAPS:
            self._info = AudioInfo.from_caps(event.get("caps"))
            self._start_outputs(event.get("caps"))
            return True
        if event.type == EventType.EOS:
            self._drain_full(final=True)
            ok = True
            for p in self.src_pads_by_source.values():
                if p.peer is not None:
                    ok = p.push_event(event) and ok
            return ok
        if event.type in (EventType.STREAM_START, EventType.SEGMENT):
            return True
        ok = True
        for p in self.src_pads_by_source.values():
            if p.peer is not None:
                ok = p.push_event(event) and ok
        return ok


__all__ = ["Demucs"]
