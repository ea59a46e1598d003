"""Brotli (RFC 7932) — uncompressed-meta-block subset.

Parity target: generic/compress's brotlicompress/brotlidecompress (the
reference links the brotli C library, which this image lacks).  The
encoder emits spec-valid streams built from uncompressed meta-blocks
(ISUNCOMPRESSED=1, §9.2), so ANY conforming brotli decoder can read its
output; the decoder handles that same subset and rejects entropy-coded
streams with a clear error (documented divergence — full RFC 7932
decoding needs the static dictionary + context modeling of the C
library).

Brotli bit order: LSB-first within each byte (§2).
"""
from __future__ import annotations

from typing import List


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._bit = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            if self._bit == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << self._bit
            self._bit = (self._bit + 1) & 7

    def align_byte(self) -> None:
        self._bit = 0

    def raw(self, data: bytes) -> None:
        assert self._bit == 0
        self.out += data


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        self.pos += n * 8
        return self.data[start:start + n]


_MAX_BLOCK = (1 << 24) - 1  # 6 nibbles


def compress(data: bytes) -> bytes:
    """Valid brotli stream of uncompressed meta-blocks (WBITS=16)."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS code '0' => 16 (§9.1)
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + _MAX_BLOCK]
        pos += len(chunk)
        w.write(0, 1)  # ISLAST = 0
        mlen = len(chunk) - 1
        if mlen < (1 << 16):
            w.write(0b00, 2)  # MNIBBLES = 4
            w.write(mlen, 16)
        elif mlen < (1 << 20):
            w.write(0b01, 2)  # MNIBBLES = 5
            w.write(mlen, 20)
        else:
            w.write(0b10, 2)  # MNIBBLES = 6
            w.write(mlen, 24)
        w.write(1, 1)  # ISUNCOMPRESSED
        w.align_byte()
        w.raw(chunk)
    # final empty meta-block: ISLAST=1, ISLASTEMPTY=1
    w.write(1, 1)
    w.write(1, 1)
    return bytes(w.out)


class BrotliSubsetError(ValueError):
    pass


def decompress(data: bytes) -> bytes:
    r = _BitReader(data)
    if r.read(1) != 0:
        # multi-bit WBITS codes imply arbitrary windows; the uncompressed
        # subset always emits '0' (16). Larger windows are fine to accept:
        code = r.read(3)
        if code == 0:
            r.read(3)  # large window / 17 family — skip extension bits
    out = bytearray()
    while True:
        islast = r.read(1)
        if islast:
            if r.read(1):  # ISLASTEMPTY
                break
        mnibbles_code = r.read(2)
        if mnibbles_code == 0b11:
            # metadata meta-block (§9.2): skip
            if r.read(1) != 0:
                raise BrotliSubsetError("reserved bit set")
            msknib = r.read(2)
            skip = r.read(8 * msknib) if msknib else 0
            r.align_byte()
            r.raw(skip + 1 if msknib else 0)
            continue
        nibbles = 4 + mnibbles_code
        mlen = r.read(4 * nibbles) + 1
        if islast:
            raise BrotliSubsetError(
                "entropy-coded final block: full RFC 7932 decoding not supported "
                "(this decoder handles the uncompressed-meta-block subset)")
        if r.read(1) != 1:  # ISUNCOMPRESSED
            raise BrotliSubsetError(
                "entropy-coded meta-block: full RFC 7932 decoding not supported "
                "(this decoder handles the uncompressed-meta-block subset)")
        r.align_byte()
        out += r.raw(mlen)
    return bytes(out)
