"""Typefinding: identify a byte stream's caps from magic bytes.

The analog of GStreamer's typefind helpers that the reference relies on
from the C core (and registers extra finders for, e.g. video/cdg's
typefind.rs).  Used by decodebin to auto-plug parsers/decoders.
"""
from __future__ import annotations

from typing import Optional


def typefind(data: bytes) -> Optional[str]:
    """Caps string for a stream head, or None when unrecognized."""
    if len(data) < 4:
        return None
    if data[:4] == b"fLaC":
        return "audio/x-flac"
    if data[:3] == b"FLV":
        return "video/x-flv"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    if data[4:8] in (b"ftyp", b"styp", b"moov"):
        return "video/quicktime"
    if data[0] == 0x47 and (len(data) < 189 or data[188] == 0x47):
        return "video/mpegts,systemstream=true,packetsize=188"
    if data[:12] == b"gst-sodium10":
        return "application/x-sodium-encrypted"
    if data[:18] == b"Scenarist_SCC V1.0":
        return "application/x-scc"
    if data.startswith(b"File Format=MacCaption_MCC"):
        return "application/x-mcc"
    if data[:6] == b"WEBVTT":
        return "application/x-subtitle-vtt"
    if data[0] == 0xFF and (data[1] >> 5) == 0b111:
        return "audio/mpeg,mpegversion=1"
    return None


__all__ = ["typefind"]
