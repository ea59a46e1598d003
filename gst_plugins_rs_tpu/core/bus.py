"""Bus: pipeline message queue (gst::Bus analog)."""
from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional

from .events import Message, MessageType


class Bus:
    def __init__(self):
        self._queue: deque = deque()
        self._watchers: List[Callable[[Message], None]] = []

    def post(self, message: Message) -> None:
        self._queue.append(message)
        for w in self._watchers:
            w(message)

    def pop(self) -> Optional[Message]:
        return self._queue.popleft() if self._queue else None

    def pop_filtered(self, *types: MessageType) -> Optional[Message]:
        for i, m in enumerate(self._queue):
            if m.type in types:
                del self._queue[i]
                return m
        return None

    def messages(self, *types: MessageType) -> List[Message]:
        """Drain and return all queued messages (optionally filtered)."""
        out = []
        rest = deque()
        while self._queue:
            m = self._queue.popleft()
            if not types or m.type in types:
                out.append(m)
            else:
                rest.append(m)
        self._queue = rest
        return out

    def add_watch(self, fn: Callable[[Message], None]) -> None:
        self._watchers.append(fn)

    def __len__(self):
        return len(self._queue)


__all__ = ["Bus"]
