"""On-chip measurement for the real fused pipeline (run when the tunnel
is up). Honest timing: every rep is its own dispatch (fresh decode with
its own coefficient upload) and a scalar readback forces completion
(block_until_ready is unreliable on the tunneled platform).

Usage: python tools/measure_device.py [--size 1024] [--reps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    # guard the probe: jax.devices() hangs forever when the tunnel is
    # down (see CLAUDE.md) — fail fast via bench.py's subprocess probe
    sys.path.insert(0, str(ROOT))
    from bench import _device_available

    if not _device_available():
        print("device unreachable (tunnel down)", file=sys.stderr)
        raise SystemExit(1)
    import jax

    print("devices:", jax.devices(), file=sys.stderr)

    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(0)
    small = rng.random((args.size // 8 + 1, args.size // 8 + 1, 3))
    img = np.kron(small.astype(np.float32), np.ones((8, 8, 1), np.float32))
    img = np.clip(img[: args.size, : args.size], 0, 1)
    data = encode_jxl_vardct(img, gabor=True, epf_iters=2)

    jx = JxlImage.from_bytes(data)
    r = jx.render_frame(0)
    planes = r.planes
    float(np.asarray(planes[0][0, 0]))  # warm + force

    # device-only: re-run the cached fused pipeline with fresh coefficient
    # uploads (decode once per rep, planes stay on device, scalar readback)
    t0 = time.perf_counter()
    for i in range(args.reps):
        jx2 = JxlImage.from_bytes(data)
        p = jx2.render_frame(0).planes
        float(np.asarray(p[0][0, 0]))
    dt = (time.perf_counter() - t0) / args.reps
    mp = args.size * args.size / 1e6
    print(f"e2e device-resident: {mp / dt:.1f} MP/s ({dt * 1e3:.2f} ms per "
          f"{args.size}^2 decode)")


if __name__ == "__main__":
    main()
