"""Decode memory budgeting (jxl-grid AllocTracker analog).

The reference tracks every large allocation against a byte budget and
fails decode with OutOfMemory beyond it (alloc_tracker.rs:8-51; the fuzz
harness runs with a 128 MiB budget). Here a contextvar-scoped tracker is
installed by JxlImage when a limit is configured; plane/channel
allocations in the modular and VarDCT decoders register against it.
"""

from __future__ import annotations

import contextvars

from .errors import JxlError

__all__ = ["AllocTracker", "current_tracker", "track_alloc", "release_alloc", "use_tracker"]


class JxlOutOfMemoryError(JxlError):
    pass


class AllocTracker:
    """Byte-budget tracker with release semantics and peak accounting
    (jxl-grid/src/alloc_tracker.rs:8-51: every large allocation registers
    a handle whose drop returns the bytes)."""

    def __init__(self, limit_bytes: int):
        self.limit = limit_bytes
        self.used = 0
        self.peak = 0

    def alloc(self, nbytes: int) -> None:
        self.used += nbytes
        if self.used > self.peak:
            self.peak = self.used
        if self.used > self.limit:
            raise JxlOutOfMemoryError(
                f"decode memory budget exceeded: {self.used} > {self.limit}"
            )

    def release(self, nbytes: int) -> None:
        self.used = max(0, self.used - nbytes)


_tracker: contextvars.ContextVar[AllocTracker | None] = contextvars.ContextVar(
    "jxl_alloc_tracker", default=None
)


def current_tracker() -> AllocTracker | None:
    return _tracker.get()


def track_alloc(nbytes: int) -> None:
    t = _tracker.get()
    if t is not None:
        t.alloc(nbytes)


def release_alloc(nbytes: int) -> None:
    t = _tracker.get()
    if t is not None:
        t.release(nbytes)


class use_tracker:
    def __init__(self, tracker: AllocTracker | None):
        self.tracker = tracker
        self._token = None

    def __enter__(self):
        self._token = _tracker.set(self.tracker)
        return self.tracker

    def __exit__(self, *exc):
        _tracker.reset(self._token)
