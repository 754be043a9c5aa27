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
