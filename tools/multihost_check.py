"""Cross-process multi-host validation of the sharded decoder.

Runs the REAL fused decode pipeline over a (hosts=2, chips=2) mesh built
from TWO separate OS processes wired through `jax.distributed` — the same
runtime a real multi-host TPU slice uses — and asserts every process-local
output shard is bit-identical to the single-device decode. This validates
what the in-process 2-D mesh tests cannot: the halo `ppermute`s at
host-band borders actually cross a process boundary (DCN in the SURVEY 5
mapping), the fused program compiles and runs SPMD in lockstep across
processes, and the host stage's globally-sharded array placement
(`make_array_from_callback` in render/vardct.py) works when most of the
mesh is non-addressable.

Usage:
  python tools/multihost_check.py             # orchestrate 2 workers
  python tools/multihost_check.py --worker I --port P --procs N

The orchestrator prints one JSON line {"ok": bool, ...} and exits 0/1.
SURVEY.md 4: "multi-host tests using JAX multi-process runtime with a CPU
mesh fake"; VERDICT r2 item 5.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHIPS_PER_HOST = 2


def _make_stream():
    sys.path.insert(0, os.path.join(_ROOT, "tools"))
    import numpy as np
    from encoder_vardct import encode_jxl_vardct

    # 4 group rows over 4 global devices; gabor + 2-pass EPF exercises
    # repeated cross-process halo exchanges
    h, w = 1024, 256
    rng = np.random.default_rng(17)
    base = rng.random((h // 16, w // 16, 3)).astype(np.float32)
    rgb = np.clip(
        np.repeat(np.repeat(base, 16, 0), 16, 1)
        + 0.01 * rng.random((h, w, 3)).astype(np.float32),
        0, 1,
    )
    return encode_jxl_vardct(rgb, gabor=True, epf_iters=2)


def worker(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    try:
        jax.config.update("jax_spmd_mode", "allow_all")
    except Exception:
        pass  # newer jax: non-jit ops on global arrays allowed by default

    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, _ROOT)
    from jxl_oxide_tpu import JxlImage

    devices = jax.devices()
    assert len(devices) == num_processes * CHIPS_PER_HOST, devices
    # host-major order: the outer mesh axis is the process (DCN) axis
    mesh = Mesh(
        np.array(devices).reshape(num_processes, CHIPS_PER_HOST),
        axis_names=("hosts", "chips"),
    )

    data = _make_stream()

    # single-device expected pixels (local decode, identical bytes in
    # every process)
    single = JxlImage.from_bytes(data).render_frame(0)
    expected = np.stack(
        [np.asarray(p, dtype=np.float32) for p in single.planes]
    )

    # the REAL decode over the cross-process mesh (all processes run the
    # same program in lockstep; jit dispatches are SPMD)
    r = JxlImage.from_bytes(data, mesh=mesh).render_frame(0)
    checked = 0
    for c, plane in enumerate(r.planes):
        for shard in plane.addressable_shards:
            got = np.asarray(shard.data)
            want = expected[c][shard.index]
            assert got.shape == want.shape, (got.shape, want.shape)
            assert np.array_equal(got, want), (
                f"proc {process_id} plane {c} shard {shard.index}: "
                f"max diff {np.abs(got - want).max()}"
            )
            checked += 1
    assert checked > 0
    print(f"worker {process_id}: {checked} local shards bit-identical",
          file=sys.stderr)


def orchestrate(num_processes: int = 2, timeout: float = 600.0) -> dict:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={CHIPS_PER_HOST}"
    ).strip()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(port),
             "--procs", str(num_processes)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(num_processes)
    ]
    result = {"ok": True, "processes": num_processes,
              "chips_per_host": CHIPS_PER_HOST, "workers": []}
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            result["ok"] = False
            result["workers"].append({"id": i, "rc": "timeout"})
            continue
        lines = [
            ln for ln in err.decode(errors="replace").strip().splitlines()
            if "cpu_aot_loader" not in ln  # benign XLA AOT-cache warning
        ]
        tail = lines[-3:]
        result["workers"].append({"id": i, "rc": p.returncode,
                                  "tail": tail})
        if p.returncode != 0:
            result["ok"] = False
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--procs", type=int, default=2)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.procs, args.port)
        return 0
    result = orchestrate(args.procs)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
