"""transcriberbin: audio+video in, caption-overlaid video out.

Parity target: video/closedcaption/src/transcriberbin (wires a transcriber
element, caption converters, and a cc overlay/mux around passthrough
video; `transcriber` property selects the element).  Composition here:

    audio -> <transcriber> -> tttocea608 -> cea608overlay.cc_sink
    video -------------------------------> cea608overlay.sink -> src

The default transcriber is whispertranscriber, which needs `model-path`
(or allow-random-weights for wiring tests) — the same model gating as the
reference's whisper.cpp models.  Properties prefixed `transcriber::` are
forwarded to the transcriber (child-proxy analog).
"""
from __future__ import annotations

from typing import Optional

from ...core import (
    Buffer,
    Caps,
    Element,
    Event,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    register,
)
from ...core.registry import element_factory_make


@register
class TranscriberBin(Element):
    ELEMENT_NAME = "transcriberbin"
    ELEMENT_CLASS = "Audio/Video/Text/Bin"
    ELEMENT_DESCRIPTION = "Transcribes audio and overlays captions on video"
    PROPERTIES = [
        Prop("transcriber", "whispertranscriber", type="str",
             doc="factory name of the transcriber element"),
        Prop("mode", "pop-on", type="enum",
             choices=["pop-on", "paint-on", "roll-up2", "roll-up3", "roll-up4"]),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.audio_pad = self.add_pad(
            Pad("sink_audio", PadDirection.SINK,
                PadTemplate("sink_audio", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.video_pad = self.add_pad(
            Pad("sink_video", PadDirection.SINK,
                PadTemplate("sink_video", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, Caps.new_any()))
        )
        self._children = []
        self._transcriber = None
        self._overlay = None
        self._built = False
        self._forwarded_props = {}

    def set_property(self, name: str, value) -> None:
        if name.startswith("transcriber::"):
            self._forwarded_props[name.split("::", 1)[1]] = value
            return
        super().set_property(name, value)

    def _build(self) -> None:
        if self._built:
            return
        self._built = True
        self._transcriber = element_factory_make(
            self.get_property("transcriber"), f"{self.name}-transcriber")
        for k, v in self._forwarded_props.items():
            self._transcriber.set_property(k, v)
        to608 = element_factory_make("tttocea608", f"{self.name}-tttocea608")
        to608.set_property("mode", self.get_property("mode"))
        self._overlay = element_factory_make("cea608overlay", f"{self.name}-overlay")
        self._children = [self._transcriber, to608, self._overlay]
        for c in self._children:
            c.parent = self.parent
        # audio -> transcriber -> 608 -> overlay.cc_sink
        self.audio_pad.chain_function = (
            lambda pad, buf: self._transcriber.sink_pads()[0].chain(buf))
        self.audio_pad.event_function = (
            lambda pad, ev: self._transcriber.sink_pads()[0].send_event(ev))
        self._transcriber.link(to608)
        to608.src_pads()[0].link(self._overlay.pad("cc_sink"))
        # video -> overlay -> ghost src
        self.video_pad.chain_function = (
            lambda pad, buf: self._overlay.pad("sink").chain(buf))
        self.video_pad.event_function = (
            lambda pad, ev: self._overlay.pad("sink").send_event(ev))
        inner = Pad("src_inner", PadDirection.SINK,
                    PadTemplate("inner", PadDirection.SINK, PadPresence.ALWAYS, Caps.new_any()))
        inner.element = self
        inner.chain_function = lambda pad, buf: self.srcpad.push(buf)
        inner.event_function = lambda pad, ev: self.srcpad.push_event(ev)
        self._overlay.pad("src").peer = inner
        inner.peer = self._overlay.pad("src")

    def on_ready_to_paused(self) -> None:
        from ...core.element import State

        self._build()
        for c in self._children:
            c.parent = self.parent
            c.set_state(State.PAUSED)

    def on_paused_to_playing(self) -> None:
        from ...core.element import State

        for c in self._children:
            c.set_state(State.PLAYING)

    def on_paused_to_ready(self) -> None:
        from ...core.element import State

        for c in self._children:
            c.set_state(State.READY)


__all__ = ["TranscriberBin"]
