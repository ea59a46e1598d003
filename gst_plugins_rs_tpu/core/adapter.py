"""Frame-based buffer adapter (gst_base::UniqueAdapter analog).

Accumulates pushed buffers and lets elements take fixed-size frame blocks,
tracking the PTS/offset of the unconsumed head — the pattern every windowed
reference element uses (audiornnoise imp.rs:317-348, hrtf imp.rs:680-697,
audioloudnorm imp.rs:218-262).
"""
from __future__ import annotations

from collections import deque
from typing import Any, Optional, Tuple

import numpy as np

from .buffer import Buffer


class Adapter:
    def __init__(self):
        self._chunks: deque = deque()  # (array, pts, offset)
        self._head = 0  # frames consumed from the first chunk
        self._available = 0
        # pts/offset of the most recent chunk data was consumed from, plus
        # frames consumed past its start (gst Adapter prev_pts semantics)
        self._last_pts: Optional[int] = None
        self._last_offset: Optional[int] = None
        self._consumed_since = 0

    def clear(self) -> None:
        self._chunks.clear()
        self._head = 0
        self._available = 0
        self._last_pts = None
        self._last_offset = None
        self._consumed_since = 0

    def push(self, buf: Buffer) -> None:
        if buf.data is None or buf.data.shape[0] == 0:
            return
        self._chunks.append((buf.data, buf.pts, buf.offset))
        self._available += int(buf.data.shape[0])

    def push_array(self, data: Any, pts: Optional[int] = None, offset: Optional[int] = None) -> None:
        if data.shape[0] == 0:
            return
        self._chunks.append((data, pts, offset))
        self._available += int(data.shape[0])

    def available(self) -> int:
        return self._available

    def prev_pts(self) -> Tuple[Optional[int], int]:
        """(pts of the chunk containing/last-containing the head, frames from
        its start).  Keeps returning the trailing position after full drain."""
        if not self._chunks:
            return self._last_pts, self._consumed_since
        _, pts, _ = self._chunks[0]
        return pts, self._head

    def prev_offset(self) -> Tuple[Optional[int], int]:
        if not self._chunks:
            return self._last_offset, self._consumed_since
        _, _, off = self._chunks[0]
        return off, self._head

    def take(self, n_frames: int):
        """Remove and return n_frames as one array (concatenated on demand)."""
        if n_frames > self._available:
            raise ValueError(f"take({n_frames}) > available {self._available}")
        pieces = []
        need = n_frames
        while need > 0:
            data, pts, off = self._chunks[0]
            left = int(data.shape[0]) - self._head
            use = min(left, need)
            pieces.append(data[self._head : self._head + use])
            self._last_pts = pts
            self._last_offset = off
            self._consumed_since = self._head + use
            need -= use
            if use == left:
                self._chunks.popleft()
                self._head = 0
            else:
                self._head += use
        self._available -= n_frames
        if len(pieces) == 1:
            out = pieces[0]
        else:
            xp = np if isinstance(pieces[0], np.ndarray) else _jnp()
            out = xp.concatenate(pieces, axis=0)
        return out

    def take_all(self):
        if self._available == 0:
            return None
        return self.take(self._available)

    def flush(self, n_frames: int) -> None:
        self.take(n_frames)


def _jnp():
    import jax.numpy as jnp

    return jnp


__all__ = ["Adapter"]
