"""Benchmark: VarDCT decode compute pipeline throughput on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 1 Gpixel/s/chip north-star (BASELINE.json).

Runs on whatever platform jax selects (the driver runs it on the real chip
via the axon platform; tests never import this module).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    from __graft_entry__ import _pipeline_fn, _synthetic_frame

    h = w = 2048
    fn = _pipeline_fn(h, w)
    args = [jax.device_put(a) for a in _synthetic_frame(h, w)]

    # warm up / compile
    fn(*args).block_until_ready()

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    mpps = (h * w * reps) / dt / 1e6
    print(json.dumps({
        "metric": "vardct_compute_pipeline_throughput",
        "value": round(mpps, 2),
        "unit": "Mpixel/s",
        "vs_baseline": round(mpps / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
