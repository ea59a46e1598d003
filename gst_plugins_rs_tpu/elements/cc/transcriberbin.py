"""transcriberbin: transcribe audio and inject closed captions into video.

Parity target: video/closedcaption/src/transcriberbin/imp.rs (3 942 LoC).
Reference topology per audio stream (imp.rs:500-607): transcriber ->
textwrap(lines=2) -> tttocea608|tttocea708 -> ccconverter -> ccmux ->
cccombiner, which attaches the caption data to the video buffers as
VideoCaptionMeta; audio and video both pass through on their own src
pads.  This rebuild composes the same in-repo elements around an internal
caption combiner (ccconverter/cccombiner are external C elements in the
reference's world — here their role is the meta-attach step below).

Property surface (imp.rs:21-37 defaults):
  passthrough (false, mutable playing — bypasses transcription),
  latency (4 s), lateness (0), translate-latency (500 ms),
  accumulate-time (0), mode (roll-up2), caption-source (both),
  input-lang-code (en-US), mux-method (cea608).

caption-source semantics (CaptionSource, imp.rs:21): `inband` keeps only
pre-existing VideoCaptionMeta on the incoming video; `transcription`
strips inband metas and attaches only transcribed captions; `both`
merges.

Pads: sink_audio / sink_video in, src_audio / src_video out
(imp.rs:2616-2640) — audio passes through, video carries captions.

Downstream rendering: cea608overlay consumes the attached
VideoCaptionMeta directly (cea608overlay/imp.rs:264-285 model).

The default transcriber is whispertranscriber, which needs `model-path`
(same model gating as the reference's whisper.cpp models).  Properties
prefixed `transcriber::` are forwarded to the transcriber (child-proxy
analog).  Multi-language translation channels live in translationbin.
"""
from __future__ import annotations

from collections import deque
from typing import Optional

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
    VideoCaptionMeta,
    register,
)
from ...core.registry import element_factory_make

MS = SECOND // 1000


@register
class TranscriberBin(Element):
    ELEMENT_NAME = "transcriberbin"
    ELEMENT_CLASS = "Audio/Video/Text/Bin"
    ELEMENT_DESCRIPTION = "Transcribes audio and muxes captions into video"
    PROPERTIES = [
        Prop("transcriber", "whispertranscriber", type="str",
             doc="factory name of the transcriber element"),
        Prop("passthrough", False, type="bool", mutable="playing",
             doc="bypass transcription; video and audio pass unchanged"),
        Prop("latency", 4 * SECOND, type="uint64", doc="transcription latency"),
        Prop("lateness", 0, type="uint64", doc="shift captions later by this"),
        Prop("translate-latency", 500 * MS, type="uint64"),
        Prop("accumulate-time", 0, type="uint64",
             doc="text accumulation window before caption encoding"),
        Prop("mode", "roll-up2", type="enum",
             choices=["pop-on", "paint-on", "roll-up2", "roll-up3", "roll-up4"]),
        Prop("caption-source", "both", type="enum",
             choices=["inband", "transcription", "both"]),
        Prop("input-lang-code", "en-US", type="str"),
        Prop("mux-method", "cea608", type="enum", choices=["cea608", "cea708"]),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        any_t = lambda n, d: PadTemplate(n, d, PadPresence.ALWAYS, Caps.new_any())
        self.audio_pad = self.add_pad(
            Pad("sink_audio", PadDirection.SINK, any_t("sink_audio", PadDirection.SINK)))
        self.video_pad = self.add_pad(
            Pad("sink_video", PadDirection.SINK, any_t("sink_video", PadDirection.SINK)))
        # video src first so Element.link / textual pipelines pick the
        # video path by default (`transcriberbin ! cea608overlay`)
        self.video_srcpad = self.add_pad(
            Pad("src_video", PadDirection.SRC, any_t("src_video", PadDirection.SRC)))
        self.audio_srcpad = self.add_pad(
            Pad("src_audio", PadDirection.SRC, any_t("src_audio", PadDirection.SRC)))
        # "src" alias kept for src_video so `transcriberbin ! cea608overlay`
        # textual pipelines link the video path by default
        self.srcpad = self.video_srcpad
        self._children = []
        self._transcriber = None
        self._built = False
        self._forwarded_props = {}
        self._pending_cc = deque()  # (pts, caption_type, bytes)
        # route caps queries per stream (audio sink <-> audio src, video
        # sink <-> video src) — the element-level default would proxy every
        # sink to the FIRST src pad
        self.audio_pad.query_function = self._proxy_caps(self.audio_srcpad)
        self.video_pad.query_function = self._proxy_caps(self.video_srcpad)

    def _proxy_caps(self, srcpad: Pad):
        from ...core import QueryType

        def q(pad: Pad, query) -> bool:
            if query.type == QueryType.CAPS:
                tmpl = pad.pad_template_caps()
                if srcpad.peer is not None:
                    query.result["caps"] = srcpad.peer_query_caps(tmpl)
                else:
                    query.result["caps"] = tmpl
                return True
            return self._default_query(pad, query)

        return q

    def set_property(self, name: str, value) -> None:
        if name.startswith("transcriber::"):
            self._forwarded_props[name.split("::", 1)[1]] = value
            if self._transcriber is not None:
                self._transcriber.set_property(name.split("::", 1)[1], value)
            return
        super().set_property(name, value)

    # -- graph construction -------------------------------------------------
    def _build(self) -> None:
        if self._built:
            return
        self._built = True
        self._transcriber = element_factory_make(
            self.get_property("transcriber"), f"{self.name}-transcriber")
        for k, v in self._forwarded_props.items():
            self._transcriber.set_property(k, v)
        if "language-code" in self._transcriber._props and \
                "language-code" not in self._forwarded_props:
            try:
                self._transcriber.set_property(
                    "language-code", self.get_property("input-lang-code"))
            except Exception:
                pass
        wrap = element_factory_make("textwrap", f"{self.name}-textwrap")
        wrap.set_property("lines", 2)  # reference: textwrap lines=2 (imp.rs:578)
        mux_method = self.get_property("mux-method")
        if mux_method == "cea708":
            toccx = element_factory_make("tttocea708", f"{self.name}-tttocea708")
        else:
            toccx = element_factory_make("tttocea608", f"{self.name}-tttocea608")
            toccx.set_property("mode", self.get_property("mode"))
        self._children = [self._transcriber, wrap, toccx]
        for c in self._children:
            c.parent = self.parent

        # audio -> transcriber -> textwrap -> tttoceaX08 -> internal cc sink
        self.audio_pad.chain_function = self._audio_chain
        self.audio_pad.event_function = self._audio_event
        self._transcriber.link(wrap)
        wrap.link(toccx)
        ccsink = Pad("cc_collect", PadDirection.SINK,
                     PadTemplate("cc_collect", PadDirection.SINK,
                                 PadPresence.ALWAYS, Caps.new_any()))
        ccsink.element = self
        ccsink.chain_function = self._cc_chain
        ccsink.event_function = lambda pad, ev: True

        def _cc_caps_query(pad, query):
            from ...core import QueryType

            if query.type == QueryType.CAPS:
                query.result["caps"] = pad.pad_template_caps()
                return True
            return False

        ccsink.query_function = _cc_caps_query
        src = toccx.src_pads()[0]
        src.peer = ccsink
        ccsink.peer = src

        self.video_pad.chain_function = self._video_chain
        self.video_pad.event_function = self._video_event

    # -- audio path ---------------------------------------------------------
    def _audio_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if not self.get_property("passthrough"):
            self._transcriber.sink_pads()[0].chain(buf)
        return self.audio_srcpad.push(buf)

    def _audio_event(self, pad: Pad, ev: Event) -> bool:
        if not self.get_property("passthrough"):
            self._transcriber.sink_pads()[0].send_event(ev)
        return self.audio_srcpad.push_event(ev)

    # -- caption collection ---------------------------------------------------
    def _cc_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        data = np.asarray(buf.data, np.uint8).reshape(-1).tobytes()
        ctype = ("cea708-raw" if self.get_property("mux-method") == "cea708"
                 else "cea608-raw")
        pts = buf.pts
        if pts is not None:
            pts += self.get_property("lateness")
        self._pending_cc.append((pts, ctype, data))
        return FlowReturn.OK

    # -- video path (the cccombiner role: attach caption meta) ---------------
    def _video_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        source = self.get_property("caption-source")
        if self.get_property("passthrough"):
            return self.video_srcpad.push(buf)
        out = Buffer(buf.data, pts=buf.pts, duration=buf.duration,
                     offset=buf.offset, offset_end=buf.offset_end)
        out.copy_metadata_from(buf)
        if source == "transcription":
            out.metas = [m for m in out.metas
                         if not isinstance(m, VideoCaptionMeta)]
        if source in ("transcription", "both"):
            end = None
            if buf.pts is not None and buf.duration is not None:
                end = buf.pts + buf.duration
            chunks = []
            ctype = None
            while self._pending_cc:
                pts, t, data = self._pending_cc[0]
                if end is not None and pts is not None and pts >= end:
                    break
                self._pending_cc.popleft()
                chunks.append(data)
                ctype = t
            if chunks:
                out.add_meta(VideoCaptionMeta(ctype, b"".join(chunks)))
        return self.video_srcpad.push(out)

    def _video_event(self, pad: Pad, ev: Event) -> bool:
        return self.video_srcpad.push_event(ev)

    # -- lifecycle -----------------------------------------------------------
    def on_ready_to_paused(self) -> None:
        from ...core.element import State

        self._build()
        self._pending_cc.clear()
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

    def latency_additional_ns(self) -> int:
        return self.get_property("latency")


__all__ = ["TranscriberBin"]
