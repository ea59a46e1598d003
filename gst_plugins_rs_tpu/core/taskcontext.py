"""Shared task contexts — threadshare's Context/Scheduler for queue tasks.

Parity target: generic/threadshare/src/runtime/executor/scheduler.rs —
elements naming the same context share ONE scheduler thread; the thread
polls every task, then parks for up to `context-wait` ms when no task
made progress (the Throttling scheduler, scheduler.rs:36-39,147).

net/context.py covers the socket-drain case (epoll+recvmmsg); this is
the generic-task case: ts-queue / ts-proxysrc drain work registered as
callables returning "did work".

    ctx = TaskContext.acquire("processing", wait_ms=5)
    handle = ctx.add_task(service_fn)     # service_fn() -> bool
    ...
    ctx.remove_task(handle); ctx.release()
"""
from __future__ import annotations

import threading
from typing import Callable, Dict


class TaskContext:
    """Named, refcounted shared worker thread servicing many tasks."""

    _registry: Dict[str, "TaskContext"] = {}
    _registry_lock = threading.Lock()

    @classmethod
    def acquire(cls, name: str, wait_ms: int = 5) -> "TaskContext":
        with cls._registry_lock:
            ctx = cls._registry.get(name)
            if ctx is None:
                ctx = cls._registry[name] = TaskContext(name, wait_ms)
            ctx._refs += 1
            return ctx

    def release(self) -> None:
        with TaskContext._registry_lock:
            self._refs -= 1
            if self._refs <= 0:
                TaskContext._registry.pop(self.name, None)
                self._stop.set()
                with self._cond:
                    self._cond.notify_all()

    def __init__(self, name: str, wait_ms: int):
        self.name = name
        self.wait_ms = max(1, int(wait_ms) or 1)
        self._refs = 0
        self._tasks: Dict[int, Callable[[], bool]] = {}
        self._next = 0
        self._cond = threading.Condition()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=f"gstpu-taskctx-{name}")
        self._thread.start()

    def add_task(self, fn: Callable[[], bool]) -> int:
        """Register a service callable; returns a handle for remove_task.
        The callable runs on the context thread and returns True when it
        made progress (more polls follow immediately) or False (idle)."""
        with self._cond:
            handle = self._next
            self._next += 1
            self._tasks[handle] = fn
            self._cond.notify_all()
        return handle

    def remove_task(self, handle: int) -> None:
        with self._cond:
            self._tasks.pop(handle, None)

    def wake(self) -> None:
        """Kick the context thread (new work arrived)."""
        with self._cond:
            self._cond.notify_all()

    @property
    def task_count(self) -> int:
        return len(self._tasks)

    def _run(self) -> None:
        while not self._stop.is_set():
            with self._cond:
                tasks = list(self._tasks.values())
            worked = False
            for fn in tasks:
                try:
                    worked = fn() or worked
                except BaseException:
                    # task owners surface their own errors; a raising task
                    # must not take down the shared thread
                    pass
            if not worked:
                with self._cond:
                    if self._stop.is_set():
                        return
                    self._cond.wait(self.wait_ms / 1000.0)


__all__ = ["TaskContext"]
