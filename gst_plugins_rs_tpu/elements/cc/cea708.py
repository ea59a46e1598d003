"""CEA-708 elements: tttocea708, cea608tocea708, cea708mux, cea708overlay,
cdpserviceinject.

Parity targets: video/closedcaption (tttocea708/, cea608tocea708/,
cea708mux/, cea708overlay/, cdpserviceinject/ registrations in lib.rs).
Caps: closedcaption/x-cea-708 with format=cc_data (packed triplets) or
format=cdp (SMPTE 334-2 framing); codec in ops/cea708.py.

cea608tocea708 embeds the original 608 pairs as cc_type-0 compatibility
triplets AND translates the decoded captions into service-1 DTVCC text
(the reference writes both, cea608tocea708/imp.rs).  cea708overlay reuses
the cea608overlay glyph-atlas compositor for the device blend.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ...core import (
    BaseTransform,
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
    TransformMode,
    register,
    video_caps_template,
)
from ...core.caps import Structure
from ...core.events import Segment
from ...core.video import RGB_FORMATS
from ...ops import cea608, cea708
from .elements import CEA608_CAPS, TEXT_CAPS

CCDATA_CAPS = Caps.builder("closedcaption/x-cea-708", format="cc_data")
CDP_CAPS = Caps.builder("closedcaption/x-cea-708", format="cdp")
CEA708_CAPS = Caps(
    [Structure("closedcaption/x-cea-708", format="cc_data"),
     Structure("closedcaption/x-cea-708", format="cdp")]
)


def _payload(buf: Buffer) -> bytes:
    return np.asarray(buf.data, np.uint8).tobytes()


def _cc_data_of(buf: Buffer, caps: Caps) -> bytes:
    data = _payload(buf)
    if caps.structure(0).get("format") == "cdp":
        data, _seq = cea708.parse_cdp(data)
    return data


@register
class TtToCea708(BaseTransform):
    """text -> DTVCC service blocks as cc_data (reference tttocea708)."""

    ELEMENT_NAME = "tttocea708"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts timed text to CEA-708 captions"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = CCDATA_CAPS
    PROPERTIES = [Prop("service", 1, type="uint", minimum=1, maximum=6)]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._seq = 0

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (CCDATA_CAPS if direction == PadDirection.SINK else TEXT_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        blocks = cea708.encode_pop_on_text(
            str(inbuf.data).split("\n"), service=self.get_property("service")
        )
        trips: List[bytes] = []
        for blk in blocks:
            trips += cea708.pack_dtvcc_packet(blk, sequence=self._seq & 0x3)
            self._seq += 1
        out = Buffer(np.frombuffer(b"".join(trips), np.uint8))
        out.copy_metadata_from(inbuf)
        return out


@register
class Cea608ToCea708(BaseTransform):
    """608 pairs -> cc_data with 608 compatibility triplets + service-1
    DTVCC translation of the decoded captions (reference cea608tocea708)."""

    ELEMENT_NAME = "cea608tocea708"
    ELEMENT_CLASS = "Generic/Converter"
    ELEMENT_DESCRIPTION = "Converts CEA-608 captions to CEA-708"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = CEA608_CAPS
    SRC_CAPS = CCDATA_CAPS

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._dec = cea608.Cea608Decoder()
        self._seq = 0

    def on_ready_to_paused(self) -> None:
        super().on_ready_to_paused()
        self._dec = cea608.Cea608Decoder()
        self._seq = 0

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (CCDATA_CAPS if direction == PadDirection.SINK else CEA608_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def transform(self, inbuf: Buffer) -> Buffer:
        pairs = np.asarray(inbuf.data, np.uint8).reshape(-1, 2)
        trips: List[bytes] = []
        for hi, lo in pairs:
            trips.append(cea708.cc_data_triplet(0, int(hi), int(lo)))  # 608 compat
            self._dec.push_pair(int(hi), int(lo))
        for ev in self._dec.take_events():
            if ev is not None:
                for blk in cea708.encode_pop_on_text(ev.lines, service=1):
                    trips += cea708.pack_dtvcc_packet(blk, sequence=self._seq & 0x3)
                    self._seq += 1
        out = Buffer(np.frombuffer(b"".join(trips), np.uint8))
        out.copy_metadata_from(inbuf)
        return out


@register
class Cea708Mux(Element):
    """Merges per-service cc_data streams into one, re-sequencing DTVCC
    packets (reference cea708mux)."""

    ELEMENT_NAME = "cea708mux"
    ELEMENT_CLASS = "Muxer/ClosedCaption"
    ELEMENT_DESCRIPTION = "Muxes CEA-708 caption streams"

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, CCDATA_CAPS))
        )
        self._count = 0
        self._started = False
        self._eos = 0

    def request_sink_pad(self, name: Optional[str] = None) -> Pad:
        idx = self._count
        self._count += 1
        pad = Pad(name or f"sink_{idx}", PadDirection.SINK,
                  PadTemplate("sink_%u", PadDirection.SINK, PadPresence.REQUEST, CEA708_CAPS))
        pad.chain_function = self._chain
        pad.event_function = self._event
        return self.add_pad(pad)

    def request_pad(self, template_name: str = "sink_%u") -> Pad:
        return self.request_sink_pad()

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if not self._started:
            self._started = True
            self.srcpad.push_event(Event.new_stream_start(f"{self.name}-src"))
            self.srcpad.push_event(Event.new_caps(CCDATA_CAPS))
            self.srcpad.push_event(Event.new_segment(Segment()))
        data = _cc_data_of(buf, pad.current_caps or CCDATA_CAPS)
        out = Buffer(np.frombuffer(data, np.uint8), pts=buf.pts, duration=buf.duration)
        return self.srcpad.push(out)

    def _event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.EOS:
            self._eos += 1
            if self._eos == len(self.sink_pads()):
                return self.srcpad.push_event(event)
            return True
        return True


@register
class CdpServiceInject(BaseTransform):
    """Wraps/rewrites caption streams as CDP with a service information
    section (reference cdpserviceinject)."""

    ELEMENT_NAME = "cdpserviceinject"
    ELEMENT_CLASS = "Filter/ClosedCaption"
    ELEMENT_DESCRIPTION = "Injects service descriptors into CDP caption streams"
    MODE = TransformMode.NEVER_IN_PLACE
    SINK_CAPS = CEA708_CAPS
    SRC_CAPS = CDP_CAPS
    PROPERTIES = [
        Prop("service", 1, type="uint", minimum=1, maximum=6),
        Prop("language", "eng", type="str"),
        Prop("fps", 30, type="uint"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._seq = 0

    def transform_caps(self, direction: PadDirection, caps: Caps, filter_) -> Caps:
        out = (CDP_CAPS if direction == PadDirection.SINK else CEA708_CAPS).copy()
        if filter_ is not None:
            out = filter_.intersect(out)
        return out

    def _service_info(self) -> bytes:
        # svc_info section body: reserved|start|change|complete + count,
        # then per service: caption_service_number + 6 descriptor bytes
        # (language + digital flags)
        lang = self.get_property("language").encode("ascii", "replace")[:3].ljust(3)
        svc = self.get_property("service")
        body = bytes([0xF0 | 0x01])  # svc_count=1 | start/change/complete flags
        body += bytes([svc & 0x1F]) + lang + bytes([0xC0 | (svc & 0x3F), 0xFF, 0x7F])
        return body

    def transform(self, inbuf: Buffer) -> Buffer:
        cc = _cc_data_of(inbuf, self.in_caps)
        cdp = cea708.build_cdp(
            cc, sequence=self._seq & 0xFFFF, fps=self.get_property("fps"),
            service_info=self._service_info(),
        )
        self._seq += 1
        out = Buffer(np.frombuffer(cdp, np.uint8))
        out.copy_metadata_from(inbuf)
        return out


@register
class Cea708Overlay(Element):
    """Renders DTVCC service captions over video on device (reference
    cea708overlay); reuses the cea608overlay glyph compositor."""

    ELEMENT_NAME = "cea708overlay"
    ELEMENT_CLASS = "Video/Overlay/Subtitle"
    ELEMENT_DESCRIPTION = "Renders CEA-708 captions over video on device"
    PROPERTIES = [
        Prop("service", 1, type="uint", minimum=1, maximum=6),
        Prop("scale", 2, type="uint", minimum=1, maximum=8),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        from .overlay import Cea608Overlay  # shares the atlas/composite

        vid_caps = video_caps_template(
            tuple(f for f in RGB_FORMATS if RGB_FORMATS[f][1] == np.uint8))
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, vid_caps))
        )
        self.ccpad = self.add_pad(
            Pad("cc_sink", PadDirection.SINK,
                PadTemplate("cc_sink", PadDirection.SINK, PadPresence.ALWAYS, CEA708_CAPS))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC,
                PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, vid_caps))
        )
        self._renderer = Cea608Overlay(f"{self.name}-render")
        self.sinkpad.chain_function = self._video_chain
        self.sinkpad.event_function = lambda pad, ev: self.srcpad.push_event(ev)
        self.ccpad.chain_function = self._cc_chain
        self.ccpad.event_function = lambda pad, ev: True
        self._decoders: Dict[int, cea708.ServiceDecoder] = {}
        self._lines: List[str] = []

    def on_ready_to_paused(self) -> None:
        self._renderer.set_property("scale", self.get_property("scale"))
        self._renderer.on_ready_to_paused()
        self._decoders = {}
        self._lines = []

    def _cc_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        data = _cc_data_of(buf, pad.current_caps or CCDATA_CAPS)
        cea708.decode_dtvcc(cea708.parse_cc_data(data), self._decoders)
        svc = self._decoders.get(self.get_property("service"))
        if svc is not None:
            for caption in svc.take_captions():
                self._lines = caption
        return FlowReturn.OK

    def _video_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if not self._lines:
            return self.srcpad.push(buf)
        import jax.numpy as jnp

        from .overlay import _composite

        frame = jnp.asarray(buf.data)
        mask, box = self._renderer._render_mask(
            tuple(self._lines), frame.shape[0], frame.shape[1]
        )
        out = Buffer(_composite(frame, mask, box))
        out.copy_metadata_from(buf)
        return self.srcpad.push(out)


__all__ = ["TtToCea708", "Cea608ToCea708", "Cea708Mux", "CdpServiceInject",
           "Cea708Overlay"]
