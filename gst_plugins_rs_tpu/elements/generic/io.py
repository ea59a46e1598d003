"""File and in-process bridge elements: rsfilesrc, rsfilesink, intersink,
intersrc, and zlib (de)compression.

Parity targets: generic/file (rsfilesrc/rsfilesink, 935 LoC),
generic/inter (intersink/intersrc in-process bridge,
generic/inter/src/sink/mod.rs:9), generic/compress (zlib/deflate enc/dec;
brotli is unavailable in this environment and gated off).
"""
from __future__ import annotations

import zlib
from collections import deque
from typing import Dict, Optional

import numpy as np

from ...core import (
    BaseSink,
    BaseSrc,
    BaseTransform,
    Buffer,
    Caps,
    FlowReturn,
    Prop,
    TransformMode,
    register,
)


@register
class FileSrc(BaseSrc):
    ELEMENT_NAME = "rsfilesrc"
    ELEMENT_CLASS = "Source/File"
    ELEMENT_DESCRIPTION = "Reads a file as raw byte buffers"
    PROPERTIES = [
        Prop("location", None, type="str", mutable="ready"),
        Prop("blocksize", 65536, type="uint", minimum=1, mutable="ready"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._f = None
        self._offset = 0

    def start(self) -> None:
        loc = self.get_property("location")
        if loc is None:
            raise RuntimeError(f"{self.name}: no location set")
        self._f = open(loc, "rb")
        self._offset = 0

    def stop(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    def fixate(self, caps: Caps) -> Caps:
        return caps.fixate() if not caps.is_any() else Caps.builder("application/octet-stream")

    def create(self) -> Optional[Buffer]:
        data = self._f.read(self.get_property("blocksize"))
        if not data:
            return None
        buf = Buffer(np.frombuffer(data, np.uint8), offset=self._offset)
        self._offset += len(data)
        return buf


@register
class FileSink(BaseSink):
    ELEMENT_NAME = "rsfilesink"
    ELEMENT_CLASS = "Sink/File"
    ELEMENT_DESCRIPTION = "Writes incoming buffer payloads to a file"
    PROPERTIES = [Prop("location", None, type="str", mutable="ready")]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._f = None

    def on_null_to_ready(self) -> None:
        loc = self.get_property("location")
        if loc is None:
            raise RuntimeError(f"{self.name}: no location set")
        self._f = open(loc, "wb")

    def on_ready_to_null(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    def render(self, buffer: Buffer) -> FlowReturn:
        data = np.asarray(buffer.data)
        self._f.write(data.tobytes())
        return FlowReturn.OK


# ---------------------------------------------------------------------------
# inter: in-process bridge between pipelines (generic/inter)
# ---------------------------------------------------------------------------
_CHANNELS: Dict[str, deque] = {}
_CHANNEL_CAPS: Dict[str, Caps] = {}


@register
class InterSink(BaseSink):
    ELEMENT_NAME = "intersink"
    ELEMENT_CLASS = "Sink/Generic"
    ELEMENT_DESCRIPTION = "Send buffers to an intersrc in the same process"
    PROPERTIES = [Prop("producer-name", "default", type="str", mutable="ready")]

    def on_caps(self, caps: Caps) -> None:
        _CHANNEL_CAPS[self.get_property("producer-name")] = caps

    def render(self, buffer: Buffer) -> FlowReturn:
        _CHANNELS.setdefault(self.get_property("producer-name"), deque()).append(buffer)
        return FlowReturn.OK

    def on_event(self, event) -> None:
        from ...core import EventType

        if event.type == EventType.EOS:
            _CHANNELS.setdefault(self.get_property("producer-name"), deque()).append(None)


@register
class InterSrc(BaseSrc):
    ELEMENT_NAME = "intersrc"
    ELEMENT_CLASS = "Source/Generic"
    ELEMENT_DESCRIPTION = "Receive buffers from an intersink in the same process"
    PROPERTIES = [Prop("producer-name", "default", type="str", mutable="ready")]

    def negotiate(self) -> Caps:
        caps = _CHANNEL_CAPS.get(self.get_property("producer-name"))
        if caps is not None:
            return caps
        return super().negotiate()

    def create(self):
        q = _CHANNELS.setdefault(self.get_property("producer-name"), deque())
        if not q:
            return BaseSrc.RETRY
        item = q.popleft()
        return None if item is None else item


# ---------------------------------------------------------------------------
# compression (generic/compress; zlib + raw deflate)
# ---------------------------------------------------------------------------
_COMPRESS_FORMATS = ["zlib", "deflate"]


@register
class CompressEnc(BaseTransform):
    ELEMENT_NAME = "compressenc"
    ELEMENT_CLASS = "Codec/Encoder"
    ELEMENT_DESCRIPTION = "Compresses buffer payloads (zlib/deflate)"
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("format", "zlib", type="enum", choices=_COMPRESS_FORMATS, mutable="ready"),
        Prop("level", 9, type="int", minimum=-1, maximum=9, mutable="ready"),
    ]

    def transform(self, inbuf: Buffer) -> Buffer:
        raw = np.asarray(inbuf.data).tobytes()
        wbits = 15 if self.get_property("format") == "zlib" else -15
        c = zlib.compressobj(self.get_property("level"), zlib.DEFLATED, wbits)
        payload = c.compress(raw) + c.flush()
        out = Buffer(np.frombuffer(payload, np.uint8))
        out.copy_metadata_from(inbuf)
        return out


@register
class CompressDec(BaseTransform):
    ELEMENT_NAME = "compressdec"
    ELEMENT_CLASS = "Codec/Decoder"
    ELEMENT_DESCRIPTION = "Decompresses buffer payloads (zlib/deflate)"
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [Prop("format", "zlib", type="enum", choices=_COMPRESS_FORMATS, mutable="ready")]

    def transform(self, inbuf: Buffer) -> Buffer:
        raw = np.asarray(inbuf.data).tobytes()
        wbits = 15 if self.get_property("format") == "zlib" else -15
        payload = zlib.decompress(raw, wbits)
        out = Buffer(np.frombuffer(payload, np.uint8))
        out.copy_metadata_from(inbuf)
        return out


__all__ = ["FileSrc", "FileSink", "InterSink", "InterSrc", "CompressEnc", "CompressDec"]

def _format_alias(base, name, fmt, desc):
    """Per-format factory names as the reference registers them
    (generic/compress/src/lib.rs: zlibcompress, deflatecompress, ...)."""

    class _Alias(base):
        ELEMENT_NAME = name
        ELEMENT_DESCRIPTION = desc

        def __init__(self, iname=None, _fmt=fmt):
            super().__init__(iname)
            self.set_property("format", _fmt)

    _Alias.__name__ = name
    return register(_Alias)


ZlibCompress = _format_alias(CompressEnc, "zlibcompress", "zlib", "Compresses with zlib")
ZlibDecompress = _format_alias(CompressDec, "zlibdecompress", "zlib", "Decompresses zlib")
DeflateCompress = _format_alias(CompressEnc, "deflatecompress", "deflate", "Compresses with raw deflate")
DeflateDecompress = _format_alias(CompressDec, "deflatedecompress", "deflate", "Decompresses raw deflate")

__all__ += ["ZlibCompress", "ZlibDecompress", "DeflateCompress", "DeflateDecompress"]



@register
class BrotliCompress(BaseTransform):
    """Brotli encoder (codecs/brotli.py: libbrotlienc via ctypes, full
    RFC 7932; stored-block fallback without the C library)."""

    ELEMENT_NAME = "brotlicompress"
    ELEMENT_CLASS = "Codec/Encoder"
    ELEMENT_DESCRIPTION = "Compresses buffers into brotli streams"
    MODE = TransformMode.NEVER_IN_PLACE

    def transform(self, inbuf: Buffer) -> Buffer:
        from ...codecs import brotli

        out = Buffer(np.frombuffer(
            brotli.compress(np.asarray(inbuf.data).tobytes()), np.uint8))
        out.copy_metadata_from(inbuf)
        return out


@register
class BrotliDecompress(BaseTransform):
    """Brotli decoder (codecs/brotli.py: libbrotlidec via ctypes, full
    RFC 7932 incl. entropy coding and the static dictionary)."""

    ELEMENT_NAME = "brotlidecompress"
    ELEMENT_CLASS = "Codec/Decoder"
    ELEMENT_DESCRIPTION = "Decompresses brotli streams"
    MODE = TransformMode.NEVER_IN_PLACE

    def transform(self, inbuf: Buffer) -> Buffer:
        from ...codecs import brotli

        out = Buffer(np.frombuffer(
            brotli.decompress(np.asarray(inbuf.data).tobytes()), np.uint8))
        out.copy_metadata_from(inbuf)
        return out
