"""Structural (non-ICI) sharding overhead, measured by COUNTED WORK.

The bench's multi-chip numbers rest on two legs (VERDICT r3 item 8):
a measured 1-chip structural efficiency on the real chip, and a
counted-halo ICI model for 8/32 chips. This script supplies the second
independent leg for the model's structural assumption: it compiles the
REAL sharded decode program on 1/2/4/8 virtual CPU devices, captures the
XLA-reported FLOP count of the per-device module, and reports

    total_work(n) / work(unsharded)  =  n * flops_per_device(n) / flops_1

— the factor by which sharding inflates compute (halo concatenations,
edge-mirror selects, padded-band masking), independent of timing noise
and of any bandwidth assumption. The counted-halo model assumes this
ratio stays near 1; this measurement validates (or corrects) that
assumption at the shard counts the virtual mesh can actually run.

Usage: python tools/structural_scaling.py [--size 1024]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

# must run before any jax backend init (the image's sitecustomize
# pre-imports jax on the tunneled platform; config.update still works
# because the backend has not initialized yet)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _module_flops(jit_fn, args) -> float:
    compiled = jit_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import jxl_oxide_tpu.ops.vardct_pipeline as vp
    from encoder_vardct import encode_jxl_vardct
    from jxl_oxide_tpu import JxlImage, parallel
    from jxl_oxide_tpu.parallel import decode_mesh
    from jxl_oxide_tpu.render.vardct import VardctFrameState

    h = w = args.size
    rng = np.random.default_rng(9)
    base = rng.random((h // 16, w // 16, 3)).astype(np.float32)
    rgb = np.clip(
        np.repeat(np.repeat(base, 16, 0), 16, 1)
        + 0.02 * rng.random((h, w, 3)).astype(np.float32),
        0, 1,
    )
    data = encode_jxl_vardct(rgb, gabor=True, epf_iters=2)

    def capture(builder_name, mesh=None):
        captured = {}
        orig = getattr(vp, builder_name)

        def spy_builder(*a, **k):
            built = orig(*a, **k)
            if isinstance(built, tuple):
                inner, shardings = built

                def spy(*fargs):
                    captured["fn"], captured["args"] = inner, fargs
                    return inner(*fargs)

                return spy, shardings
            inner = built

            def spy(*fargs):
                captured["fn"], captured["args"] = inner, fargs
                return inner(*fargs)

            return spy

        cache_keys = set(VardctFrameState._fused_cache)
        setattr(vp, builder_name, spy_builder)
        parallel.set_decode_mesh(mesh)
        try:
            JxlImage.from_bytes(data).render_frame(0).to_u8()
        finally:
            parallel.set_decode_mesh(None)
            setattr(vp, builder_name, orig)
            for key in set(VardctFrameState._fused_cache) - cache_keys:
                del VardctFrameState._fused_cache[key]
        return captured.get("fn"), captured.get("args")

    fn, fargs = capture("build_fused_pipeline")
    flops_1 = _module_flops(fn, fargs) if fn is not None else 0.0

    ratios = {}
    for n in (1, 2, 4, 8):
        fn, fargs = capture("build_fused_pipeline_sharded",
                            mesh=decode_mesh(n))
        if fn is None or flops_1 <= 0:
            ratios[str(n)] = None
            continue
        per_dev = _module_flops(fn, fargs)
        ratios[str(n)] = round(per_dev * n / flops_1, 4)

    print(json.dumps({
        "size": args.size,
        "unsharded_flops": flops_1,
        "structural_work_ratio": ratios,
        "note": "n * per-device XLA flops of the sharded program / "
                "unsharded flops; counted, not timed (virtual CPU mesh)",
    }))


if __name__ == "__main__":
    main()
