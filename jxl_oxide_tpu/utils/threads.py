"""Decode thread-pool sizing (jxl-threadpool analog).

The host-side parallel grain is one TOC section per task; worker count
follows --num-threads / JXL_TPU_NUM_THREADS, defaulting to the CPU
count (jxl-oxide-cli --num-threads; jxl-threadpool lib.rs:12-21).
"""

from __future__ import annotations

import os

_configured: int | None = None


def set_num_threads(n: int | None) -> None:
    global _configured
    _configured = n if n is None or n > 0 else 1


def num_workers(n_jobs: int) -> int:
    limit = _configured
    if limit is None:
        env = os.environ.get("JXL_TPU_NUM_THREADS")
        limit = int(env) if env else (os.cpu_count() or 1)
    return max(1, min(n_jobs, limit))


_bg = None
_bg_pid = None


def background_executor():
    """Process-wide 2-worker executor for decode-overlap helpers
    (HfGlobal parse / coefficient-plane zero-fill behind the serial LF
    section). Persistent: spawning a fresh ThreadPoolExecutor per decode
    cost more than the overlap saved on small frames. Fork-safe via pid
    check (the pattern the native worker pool uses)."""
    global _bg, _bg_pid
    pid = os.getpid()
    if _bg is None or _bg_pid != pid:
        import concurrent.futures as cf

        _bg = cf.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="jxl-bg"
        )
        _bg_pid = pid
    return _bg
