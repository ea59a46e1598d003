"""Pipeline clocks: monotonic SystemClock + manually-driven TestClock.

The reference gets clocked scheduling from the GStreamer C core: elements
arm single-shot clock ids and either block on them or get async callbacks
(e.g. fallbackswitch's timeout_clock_id,
utils/fallbackswitch/src/fallbackswitch/imp.rs:88-126).  This module owns
that contract for the framework:

- `Clock.now()` in nanoseconds; `new_single_shot_id(t)` returns a
  `ClockId` supporting blocking `wait()`, `wait_async(cb)`, and
  `unschedule()`.
- `SystemClock` is the process-wide monotonic clock (one timer thread,
  heap of pending ids).
- `TestClock` is advanced manually (`advance`/`set_time`) and fires due
  async waiters synchronously on the advancing thread — the
  gst_check::TestClock analog, keeping live-element tests deterministic.

Pipelines select a clock when going to PLAYING and stamp every element
with it plus a `base_time`; element running time = now() - base_time
(core/pipeline.py).
"""
from __future__ import annotations

import heapq
import itertools
import threading
import time
from enum import IntEnum
from typing import Callable, List, Optional


class ClockReturn(IntEnum):
    OK = 0
    EARLY = 1
    UNSCHEDULED = 2


_seq = itertools.count()


class ClockId:
    """Single-shot wait on an absolute clock time (ns)."""

    __slots__ = ("clock", "time", "_order", "_done", "_callback", "_unscheduled")

    def __init__(self, clock: "Clock", time_ns: int):
        self.clock = clock
        self.time = int(time_ns)
        self._order = next(_seq)
        self._done = threading.Event()
        self._callback: Optional[Callable[["ClockId"], None]] = None
        self._unscheduled = False

    def wait(self) -> ClockReturn:
        return self.clock._wait(self)

    def wait_async(self, callback: Callable[["ClockId"], None]) -> None:
        self.clock._wait_async(self, callback)

    def unschedule(self) -> None:
        self.clock._unschedule(self)

    def __lt__(self, other: "ClockId") -> bool:
        return (self.time, self._order) < (other.time, other._order)


class Clock:
    def now(self) -> int:
        raise NotImplementedError

    def new_single_shot_id(self, time_ns: int) -> ClockId:
        return ClockId(self, time_ns)

    # internal contract used by ClockId
    def _wait(self, cid: ClockId) -> ClockReturn:
        raise NotImplementedError

    def _wait_async(self, cid: ClockId, callback) -> None:
        raise NotImplementedError

    def _unschedule(self, cid: ClockId) -> None:
        cid._unscheduled = True
        cid._done.set()


class SystemClock(Clock):
    """Monotonic wall clock with one shared timer thread."""

    _instance: Optional["SystemClock"] = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.Condition()
        self._heap: List[ClockId] = []
        self._thread: Optional[threading.Thread] = None

    @classmethod
    def obtain(cls) -> "SystemClock":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def now(self) -> int:
        return time.monotonic_ns()

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._run, name="gstpu-clock", daemon=True)
            self._thread.start()

    def _run(self) -> None:
        while True:
            with self._lock:
                while self._heap and (self._heap[0]._unscheduled
                                      or self._heap[0]._done.is_set()):
                    heapq.heappop(self._heap)
                if not self._heap:
                    self._lock.wait(timeout=1.0)
                    continue
                head = self._heap[0]
                delta = head.time - self.now()
                if delta > 0:
                    self._lock.wait(timeout=delta / 1e9)
                    continue
                heapq.heappop(self._heap)
                cb = head._callback
            head._done.set()
            if cb is not None and not head._unscheduled:
                try:
                    cb(head)
                except Exception:  # element callbacks must not kill the clock
                    import logging

                    logging.getLogger("gstpu.clock").exception(
                        "clock callback raised")

    def _wait(self, cid: ClockId) -> ClockReturn:
        delta = cid.time - self.now()
        if delta <= 0:
            return ClockReturn.UNSCHEDULED if cid._unscheduled else ClockReturn.EARLY
        cid._done.wait(timeout=delta / 1e9)
        return ClockReturn.UNSCHEDULED if cid._unscheduled else ClockReturn.OK

    def _wait_async(self, cid: ClockId, callback) -> None:
        cid._callback = callback
        with self._lock:
            heapq.heappush(self._heap, cid)
            self._ensure_thread()
            self._lock.notify_all()

    def _unschedule(self, cid: ClockId) -> None:
        with self._lock:
            super()._unschedule(cid)
            self._lock.notify_all()


class TestClock(Clock):
    """Deterministic clock for tests: time moves only via advance()/set_time();
    due async waiters fire synchronously on the advancing thread."""

    __test__ = False  # not a pytest test class despite the name

    def __init__(self, start: int = 0) -> None:
        self._now = int(start)
        self._lock = threading.Condition()
        self._pending: List[ClockId] = []

    def now(self) -> int:
        with self._lock:
            return self._now

    def advance(self, delta_ns: int) -> None:
        self.set_time(self.now() + int(delta_ns))

    def set_time(self, t: int) -> None:
        due: List[ClockId] = []
        with self._lock:
            assert t >= self._now, "TestClock cannot go backwards"
            self._now = int(t)
            keep = []
            for cid in self._pending:
                if cid._unscheduled:
                    continue
                if cid.time <= self._now:
                    due.append(cid)
                else:
                    keep.append(cid)
            self._pending = keep
            self._lock.notify_all()
        for cid in sorted(due):
            cid._done.set()
            if cid._callback is not None and not cid._unscheduled:
                cid._callback(cid)

    def pending_count(self) -> int:
        with self._lock:
            return len([c for c in self._pending if not c._unscheduled])

    def crank(self) -> bool:
        """Advance to the earliest pending wait and fire it — the
        gst_test_clock_crank_single_clock_wait analog.  Returns False when
        nothing is pending."""
        with self._lock:
            live = [c for c in self._pending if not c._unscheduled]
            if not live:
                return False
            target = min(c.time for c in live)
        self.set_time(max(target, self.now()))
        return True

    def _wait(self, cid: ClockId) -> ClockReturn:
        with self._lock:
            if cid.time <= self._now:
                return ClockReturn.EARLY
            self._pending.append(cid)
        cid._done.wait()
        return ClockReturn.UNSCHEDULED if cid._unscheduled else ClockReturn.OK

    def _wait_async(self, cid: ClockId, callback) -> None:
        with self._lock:
            cid._callback = callback
            if cid.time <= self._now:
                fire = True
            else:
                self._pending.append(cid)
                fire = False
        if fire:
            cid._done.set()
            callback(cid)

    def _unschedule(self, cid: ClockId) -> None:
        with self._lock:
            super()._unschedule(cid)


__all__ = ["Clock", "ClockId", "ClockReturn", "SystemClock", "TestClock"]
