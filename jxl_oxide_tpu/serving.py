"""Concurrent decode for serving workloads.

The per-image decode is a host entropy stage feeding one (or a few)
device dispatches; a single stream leaves both sides idle half the time.
`decode_batch` overlaps N decodes on a thread pool — host symbol decode
of image k+1 runs while image k's device program executes and its pixels
transfer — which is the shape the bench's pipelined/serving modes
measure (the reference has no batch API; its unit of concurrency is the
intra-image thread pool, jxl-threadpool/src/lib.rs).

Device-resident mode returns the renders without a host readback so a
TPU-side consumer (e.g. a vision model) can ingest the planes directly.
"""

from __future__ import annotations

import concurrent.futures as _cf
from typing import Iterable, Sequence

from .api import JxlImage

__all__ = ["decode_batch", "decode_iter"]

_OUTPUT_KINDS = ("u8", "f32", "device", "render")


def _decode_one(data: bytes, frame: int, output: str, builder_kwargs):
    img = JxlImage.from_bytes(data, **builder_kwargs)
    r = img.render_frame(frame)
    if output == "render":
        return r
    if output == "device":
        # oriented, alpha-inclusive [H, W, C]; stays on the accelerator
        # when the decode produced device-resident planes
        return r._image_device()
    if output == "u8":
        return r.to_u8()
    return r.image()  # "f32"


def decode_batch(streams: Sequence[bytes], *, frame: int = 0,
                 output: str = "u8", num_workers: int = 8,
                 **builder_kwargs) -> list:
    """Decode many independent JXL byte streams concurrently.

    output: "u8" ([H, W, C] uint8, host), "f32" (float32, host),
    "device" (per-channel planes, left on the accelerator — no host
    readback), or "render" (the full Render object).
    builder_kwargs pass through to JxlImage (num_threads, mesh, ...).
    Results are returned in input order; a failed decode raises (the
    remaining futures are still awaited).
    """
    if output not in _OUTPUT_KINDS:
        raise ValueError(f"unknown output kind {output!r}")
    streams = list(streams)
    if not streams:
        return []
    if len(streams) == 1 or num_workers <= 1:
        return [_decode_one(d, frame, output, builder_kwargs)
                for d in streams]
    with _cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        futs = [ex.submit(_decode_one, d, frame, output, builder_kwargs)
                for d in streams]
        return [f.result() for f in futs]


def decode_iter(streams: Iterable[bytes], *, frame: int = 0,
                output: str = "u8", num_workers: int = 8,
                window: int | None = None, **builder_kwargs):
    """Streaming variant: yields decoded results in input order while at
    most `window` (default 2*num_workers) decodes are in flight — bounded
    memory for arbitrarily long input streams."""
    if output not in _OUTPUT_KINDS:
        raise ValueError(f"unknown output kind {output!r}")
    if window is None:
        window = 2 * num_workers
    window = max(1, window)
    import collections

    pending: collections.deque = collections.deque()
    with _cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        for data in streams:
            pending.append(
                ex.submit(_decode_one, data, frame, output, builder_kwargs)
            )
            while len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
