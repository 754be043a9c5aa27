"""Benchmark: VarDCT/Modular decode throughput on the TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} where
`value` is the flagship PER-CHIP decode throughput: the real fused decoder
program (LF + HF dequant + CfL + inverse transforms + gaborish + EPF)
captured from an actual bitstream decode and timed on-chip with dispatch
latency cancelled (paired K vs 2K chained iterations). This matches the
BASELINE.json north-star, which is stated per chip (>= 1 Gpixel/s/chip).

End-to-end through THIS dev box is reported separately and is bounded by
the dev tunnel, not the chip: the host<->device link here is an ~40 MiB/s
RPC tunnel with ~25 ms dispatch latency (a production chip sits on PCIe
at GiB/s). `e2e_tunnel_mpps` and the per-case corpus measure that full
path honestly; `transfer_mbps` documents the link so the two can be
reconciled. Extra fields make each component separable (VERDICT r1: the
tunnel must not hide regressions):

  host_entropy_mpps   CPU symbol-decode stage alone (multithreaded)
  device_mpps         synthetic-frame device pipeline (compute only)
  transfer_mbps       host->device->host round-trip bandwidth (best-of-3)
  e2e_tunnel_mpps     full decode through the tunnel (host stage + upload
                      + device program + u8 readback)
  e2e_device_resident pixels left on device (TPU-ingest serving mode)
  cases               per-case MP/s over the bench corpus (the reference's
                      criterion matrix shape: EPF 2/3, 4:2:0, progressive,
                      mixed transforms, lossless Modular RLE/noisy;
                      jxl-oxide-tests/benches/decode.rs:10-65)
  scaling             BASELINE scaling-efficiency evidence: the sharded
                      (shard_map + ppermute) program measured on a
                      1-device mesh of the real chip (structural SPMD
                      cost, zero ICI traffic) plus a counted-halo-bytes
                      model of 8/32-chip efficiency at v5p ICI bandwidth

vs_baseline is against the 1 Gpixel/s/chip north-star (BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def _smooth_rgb(h, w, seed=0, block=8):
    rng = np.random.default_rng(seed)
    small = rng.random((h // block + 1, w // block + 1, 3)).astype(np.float32)
    img = np.kron(small, np.ones((block, block, 1), dtype=np.float32))[:h, :w]
    return np.clip(img, 0, 1)


def _make_cases() -> dict:
    """Bench corpus: name -> (bytes, h, w)."""
    from encoder import encode_jxl_modular
    from encoder_vardct import (
        encode_jxl_vardct,
        encode_jxl_vardct_tiled,
    )

    cases = {}
    h = w = 1024
    img = _smooth_rgb(h, w, seed=0)
    cases["vardct_xyb"] = (
        encode_jxl_vardct(img, global_scale=4096, xyb=True), h, w)
    cases["vardct_epf2_gabor"] = (
        encode_jxl_vardct(_smooth_rgb(512, 512, 1), gabor=True, epf_iters=2),
        512, 512)
    cases["vardct_epf3"] = (
        encode_jxl_vardct(_smooth_rgb(512, 512, 2), epf_iters=3), 512, 512)
    cases["vardct_2pass"] = (
        encode_jxl_vardct(_smooth_rgb(512, 512, 3), num_passes=2), 512, 512)

    # 4:2:0 chroma-subsampled at the SAME 1024^2 geometry as the
    # flagship case so the ratio to vardct_xyb is apples-to-apples
    # (round 4: one fused dispatch incl. in-program chroma upsample +
    # gabor/EPF — jxl-render/src/vardct/mod.rs subsampled path)
    from jxl_oxide_tpu.models.vardct import (
        TransformType as _T420,
        jpeg_shifts as _jps,
    )

    rng = np.random.default_rng(4)
    h420 = w420 = 1024
    b420 = h420 // 8
    ups420 = (0, 1, 0)
    shifts420 = _jps(ups420)
    sel420 = np.full((b420, b420), int(_T420.DCT8), dtype=np.int64)
    mul420 = np.ones((b420, b420), dtype=np.int64)
    c420 = []
    lf420 = []
    for c in range(3):
        hs, vs = shifts420[c]
        sh = (h420 >> vs, w420 >> hs)
        cp = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.2
        cp[m] = rng.integers(-10, 11, int(m.sum()))
        c420.append(cp)
        lf420.append(
            rng.integers(-60, 61, (b420 >> vs, b420 >> hs)).astype(np.int64)
        )
    cases["vardct_420"] = (
        encode_jxl_vardct_tiled(
            h420, w420, sel420, mul420, c420, lf420,
            gabor=True, epf_iters=2, jpeg_upsampling=ups420,
        ),
        h420, w420)

    # mixed transform types over multiple groups
    sys.path.insert(0, "/root/repo/tests")
    from test_parallel import _random_varblock_grid

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(5)
    mh, mw = 512, 512
    bh, bw = mh // 8, mw // 8
    sel, mul = _random_varblock_grid(
        bh, bw, rng,
        [T.DCT8, T.DCT2, T.DCT4, T.HORNUSS, T.DCT16, T.DCT32, T.DCT16X8,
         T.AFV0],
    )
    coeff = rng.integers(-15, 16, (3, mh, mw)).astype(np.int64)
    coeff[rng.random((3, mh, mw)) < 0.8] = 0
    lf_q = rng.integers(-60, 61, (3, bh, bw)).astype(np.int64)
    sharp = rng.integers(0, 8, (bh, bw)).astype(np.int64)
    cases["vardct_mixed_epf2"] = (
        encode_jxl_vardct_tiled(mh, mw, sel, mul, coeff, lf_q, gabor=True,
                                epf_iters=2, sharpness=sharp),
        mh, mw)

    # lossless Modular: fast-lossless LZ77-RLE (flat runs) and noisy
    # (entropy heavy)
    rng = np.random.default_rng(6)
    flat = [
        np.repeat(rng.integers(0, 256, (1024, 32), dtype=np.int64), 32, 1)
        for _ in range(3)
    ]
    cases["modular_rle"] = (
        encode_jxl_modular(flat, bit_depth=8, lz77_rle=True), 1024, 1024)
    noisy = [
        rng.integers(0, 256, (512, 512), dtype=np.int64) for _ in range(3)
    ]
    cases["modular_noisy"] = (
        encode_jxl_modular(noisy, bit_depth=8), 512, 512)

    # MA-tree content (the reference's effort-7 lossless shape): a
    # decision tree routes samples between gradient leaves, driving the
    # general walk-tree decode path instead of the single-leaf fast path
    from encoder import _pack_signed, forward_residuals

    def _pk(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    rng = np.random.default_rng(9)
    tree_chans = [rng.integers(0, 256, (512, 512)).astype(np.int64)
                  for _ in range(3)]
    tree_tokens = [4, _pk(255),          # decision: prop 3 (x) > 255
                   0, 5, 0, 0, 0,        # both leaves: gradient
                   0, 5, 0, 0, 0]

    def _tree_token_fn(channels):
        toks = []
        for arr in channels:
            for r in forward_residuals(np.asarray(arr), 5):
                toks.append(_pack_signed(r))
        return toks

    cases["modular_ma_tree"] = (
        encode_jxl_modular(tree_chans,
                           custom_tree=(tree_tokens, 2, _tree_token_fn)),
        512, 512)

    # weighted-predictor lossless (the effort-7 shape): tokens generated
    # with the independent Python WP oracle from the test suite
    sys.path.insert(0, "/root/repo/tests")
    from test_roundtrip import _RefWp

    rng = np.random.default_rng(13)
    wp_h = wp_w = 256
    wp_target = rng.integers(0, 32, (wp_h, wp_w)).astype(np.int64) * 8
    wp_state = _RefWp(wp_w)
    wp_toks = []
    for y in range(wp_h):
        for x in range(wp_w):
            a = wp_target
            W = int(a[y, x - 1]) if x > 0 else (int(a[y - 1, 0]) if y > 0
                                                else 0)
            N = int(a[y - 1, x]) if y > 0 else W
            NW = int(a[y - 1, x - 1]) if (x > 0 and y > 0) else W
            NE = int(a[y - 1, x + 1]) if (y > 0 and x + 1 < wp_w) else N
            NN = int(a[y - 2, x]) if y >= 2 else N
            pred = (wp_state.predict(N, NW, NE, W, NN) + 3) >> 3
            v = int(a[y, x]) - pred
            wp_toks.append((v << 1) if v >= 0 else (-(v << 1) - 1))
            wp_state.record(int(a[y, x]))
    cases["modular_wp"] = (
        encode_jxl_modular([wp_target], bit_depth=8, grayscale=True,
                           custom_tree=([0, 6, 0, 0, 0], 1,
                                        lambda _c: list(wp_toks))),
        wp_h, wp_w)

    # BASELINE config 4: animated GOP with blending (all keyframes decode)
    rng = np.random.default_rng(7)
    frames = []
    base = [rng.integers(0, 200, (512, 512), dtype=np.int64)
            for _ in range(3)]
    frames.append(base)
    for _ in range(3):
        frames.append([np.clip(c + rng.integers(-8, 9, c.shape), 0, 255)
                       for c in frames[-1]])
    cases["animation_4f_blend"] = (
        encode_jxl_modular(frames[0], bit_depth=8, animation_frames=frames),
        512 * 4, 512)

    # BASELINE config 2 geometry: 2048x1536 lossy VarDCT with the full
    # restoration path (gaborish + EPF-2) — placed last so a congested
    # tunnel budget-skips it rather than the cheaper cases
    cases["vardct_2048x1536_epf2"] = (
        encode_jxl_vardct(_smooth_rgb(1536, 2048, seed=8), gabor=True,
                          epf_iters=2),
        1536, 2048)
    return cases


def _decode(data: bytes) -> np.ndarray:
    from jxl_oxide_tpu import JxlImage

    img = JxlImage.from_bytes(data)
    out = None
    for i in range(img.num_keyframes):
        out = img.render_frame(i).to_u8()
    return out


def _bench_case(data: bytes, h: int, w: int, reps: int = 12,
                pipelined: bool = True, budget_s: float = 120.0) -> float:
    """Adaptive: after the warm decode, size reps/rounds to the link speed
    so a congested dev tunnel can't blow the run past the driver timeout."""
    t0 = time.perf_counter()
    _decode(data)  # warm (jit compile)
    warm_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    _decode(data)
    single_t = time.perf_counter() - t0
    reps = max(1, min(reps, int(budget_s / max(single_t, 1e-3) / 2)))
    rounds = 2 if reps * single_t * 2 < budget_s else 1
    best = (h * w) / single_t / 1e6
    for _ in range(rounds):
        t0 = time.perf_counter()
        if pipelined and reps > 1:
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(max_workers=8) as ex:
                list(ex.map(lambda _: _decode(data), range(reps)))
        else:
            for _ in range(reps):
                _decode(data)
        dt = time.perf_counter() - t0
        best = max(best, (h * w * reps) / dt / 1e6)
    return best


def _bench_case_device_resident(data: bytes, h: int, w: int,
                                reps: int = 8) -> float:
    """Per-case decode with pixels LEFT ON DEVICE (no u8 readback): the
    per-case number then tracks host stage + upload + device program
    instead of the tunnel's download leg (VERDICT r4 item 7 — r03/r04
    corpus numbers swung 7x on tunnel weather alone). 8-way pipelined so
    upload latency overlaps host work."""
    from jxl_oxide_tpu import JxlImage

    def decode_dev():
        img = JxlImage.from_bytes(data)
        out = None
        for i in range(img.num_keyframes):
            r = img.render_frame(i)
            out = r.planes
        try:
            import jax

            if isinstance(out[0], jax.Array):
                float(np.asarray(out[0][0, 0]))  # completion sync
        except ImportError:
            pass

    decode_dev()  # warm
    import concurrent.futures as cf

    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(lambda _: decode_dev(), range(reps)))
        dt = time.perf_counter() - t0
        best = max(best, (h * w * reps) / dt / 1e6)
    return best


def _bench_device_resident(data: bytes, h: int, w: int, reps: int = 16) -> float:
    """Serving mode for TPU-side consumers: pixels stay on device (no u8
    readback over the link). 8 concurrent decodes overlap host entropy
    work with the per-decode link round-trips (the tunnel is
    latency-bound: 4 -> 8 workers measured 24 -> 31 MP/s)."""
    from jxl_oxide_tpu import JxlImage

    def decode_dev():
        img = JxlImage.from_bytes(data)
        r = img.render_frame(0)
        planes = r.planes
        try:
            import jax

            if isinstance(planes[0], jax.Array):
                # scalar readback: block_until_ready is unreliable on the
                # tunneled platform (returns before execution completes)
                float(np.asarray(planes[0][0, 0]))
        except ImportError:
            pass
        return planes

    decode_dev()
    import concurrent.futures as cf

    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(lambda _: decode_dev(), range(reps)))
        dt = time.perf_counter() - t0
        best = max(best, (h * w * reps) / dt / 1e6)
    return best


def _bench_serving_batched(data: bytes, h: int, w: int,
                           stack: int = 8, reps: int = 3) -> float:
    """Stacked-batch serving (serving.decode_batch_stacked): same-
    geometry images share ONE vmapped device program + one color tail,
    dividing the fixed per-dispatch link cost by the stack size (VERDICT
    r3 item 5). Device-resident output (the TPU-ingest serving mode):
    pixels stay on the accelerator, completion forced by a scalar
    readback (block_until_ready is unreliable on the tunneled
    platform)."""
    from jxl_oxide_tpu.serving import decode_batch_stacked

    streams = [data] * stack

    def run():
        out = decode_batch_stacked(streams, output="device", num_workers=4)
        assert len(out) == stack
        for o in out:
            float(np.asarray(o[0, 0, 0]))  # completion sync
        return out

    run()  # warm
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = max(best, (h * w * stack) / dt / 1e6)
    return best


def _bench_pipelines_pair(size: int = 1024):
    """(real_mpps, sharded_mpps) measured INTERLEAVED: the 1-chip SPMD
    efficiency is their ratio, and the dev box's ±15% ambient drift plus
    tunnel jitter previously hit the two legs minutes apart (observed
    ratio spread 0.67-0.88 across runs). Interleaving the K/2K chained
    dispatches of both programs inside one loop puts both legs under the
    same ambient conditions."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import jxl_oxide_tpu.ops.vardct_pipeline as vp
    from encoder_vardct import encode_jxl_vardct
    from jxl_oxide_tpu import JxlImage, parallel
    from jxl_oxide_tpu.render.vardct import VardctFrameState

    h = w = size
    data = encode_jxl_vardct(_smooth_rgb(h, w, seed=9), gabor=True,
                             epf_iters=2)

    def capture(builder_name, mesh):
        captured = {}
        orig = getattr(vp, builder_name)

        def spy_builder(*a, **k):
            built = orig(*a, **k)
            if isinstance(built, tuple):
                inner, shardings = built

                def spy(*args):
                    captured["fn"], captured["args"] = inner, args
                    return inner(*args)

                return spy, shardings
            inner = built

            def spy(*args):
                captured["fn"], captured["args"] = inner, args
                return inner(*args)

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

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    fn_r, args_r = capture("build_fused_pipeline", None)
    fn_s, args_s = capture("build_fused_pipeline_sharded", mesh1)
    if fn_r is None or fn_s is None:
        return 0.0, 0.0

    def chained(fn, k):
        @jax.jit
        def f(*args):
            coeff, lf = args[0], args[1]

            def body(i, acc):
                d = (i & 1).astype(jnp.int32)
                if isinstance(coeff, tuple):
                    c = (coeff[0], coeff[1] + d.astype(coeff[1].dtype))
                else:
                    c = coeff + d
                out = fn(c, lf + d.astype(lf.dtype), *args[2:])
                return acc + out[0]

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros((h, w), jnp.float32)
            )

        return f

    k = 64
    runners = {
        "r1": (chained(fn_r, k), args_r), "r2": (chained(fn_r, 2 * k), args_r),
        "s1": (chained(fn_s, k), args_s), "s2": (chained(fn_s, 2 * k), args_s),
    }

    def run(name):
        f, args = runners[name]
        return float(np.asarray(f(*args)[0, 0]))

    for name in runners:
        run(name)  # warm/compile
    best = {name: float("inf") for name in runners}
    for _ in range(4):
        for name in ("r1", "s1", "r2", "s2"):  # interleaved A/B
            t0 = time.perf_counter()
            run(name)
            best[name] = min(best[name], time.perf_counter() - t0)

    def rate(t1, t2):
        diff = t2 - t1
        if diff < 0.05 * t2:
            diff = t2 / 2.0
        return (h * w * k) / diff / 1e6

    return rate(best["r1"], best["r2"]), rate(best["s1"], best["s2"])


def _scaling_model(per_chip_mpps: float, size: int = 1024,
                   epf_iters: int = 2) -> dict:
    """Multi-chip scaling MODEL ESTIMATE (not a measurement, not a
    bound) from counted halo traffic vs the measured per-chip compute
    rate. Halo bytes per shard boundary per decode, by-rows sharding,
    f32, both directions:
      LF smoothing: 1 row at LF res (W/8), 3 channels
      gaborish:     1 row at full res, 3 channels
      EPF:          3 rows per pass at full res, 3 channels
    (ops/vardct_pipeline.py:450,602,623). v5p ICI one-way link bandwidth
    ~9e10 B/s (public v5p specs). The halo is charged fully exposed (no
    compute overlap) AND each of the 2+epf_iters sequential exchanges
    pays a per-collective ICI latency term — but the model also assumes
    the per-chip compute rate is unchanged at 1/n-size shards, which it
    will not be at 32 chips on a 1024px frame (32 rows per shard):
    treat the numbers as estimates, and reconcile against the measured
    structural overhead at n=2/4/8 on the virtual mesh (the
    structural_validation block: counted flops show ~4% structural work
    inflation when every shard holds real group bands, and a hard
    granularity cliff when n exceeds the frame's 256px group-band count
    — a 1024^2 frame supports at most 4 row shards; the 8/32-chip
    projections therefore apply to frames with >= n group bands).
    Frame-parallel serving (independent frames per chip) has no
    cross-chip traffic and sits at ~1.0 by construction; this models
    the harder single-frame-sharded case."""
    ici_bps = 9e10
    ici_latency_s = 2e-6  # per sequential halo exchange (launch + hop)
    w = size
    # LF smooth (1 row @ W/8) + gabor (1 row) + EPF (3 rows per pass)
    bytes_boundary = (1 * (w // 8) + 1 * w + 3 * epf_iters * w) * 3 * 4 * 2
    n_exchanges = 2 + epf_iters  # sequential ppermute rounds per decode
    out = {"halo_bytes_per_boundary": bytes_boundary,
           "halo_exchanges_per_decode": n_exchanges,
           "model_note": "estimate: fully-exposed halo + per-exchange "
                         "latency, per-chip rate assumed shard-size-"
                         "independent"}
    for n in (8, 32):
        px_per_shard = size * size / n
        t_compute = px_per_shard / (per_chip_mpps * 1e6)
        t_halo = (bytes_boundary / ici_bps
                  + n_exchanges * ici_latency_s)
        out[f"modeled_efficiency_{n}chip"] = round(
            t_compute / (t_compute + t_halo), 4)
    return out


def _bench_host_entropy():
    """Headline host-entropy numbers on the 4096^2 multi-LF-group stream
    (4 LF groups x 256 pass groups: every host stage — LF batch, HF
    batch, zero-fill — has parallel grain, the geometry where thread
    scaling is meaningful; content = the 1024^2 dense case's real
    quantized coefficients tiled, so per-pixel token density matches).
    Also returns the 1024^2 single-LF-group numbers (the geometry whose
    LF section is inherently serial) as supplementary fields."""
    import multiprocessing

    from bench_host import host_stage, make_stream

    threads = min(8, multiprocessing.cpu_count())
    data = make_stream(4096, dense=True)
    best = best1 = None
    # best-of-N against ambient load on the shared dev box (±15%);
    # single-thread gets more reps since it IS the per-core headline
    import os as _os

    def _pinned_1t(data_, reps):
        # pin the process to one core for the single-thread reps:
        # scheduler migrations on the shared VM cost a few percent, and
        # the per-core number sits right at the 100 MP/s target
        best1_ = None
        try:
            saved = _os.sched_getaffinity(0)
            _os.sched_setaffinity(0, {min(saved)})
        except (AttributeError, OSError):
            saved = None
        try:
            for _ in range(reps):
                dt_, mp_, _ = host_stage(data_, 1)
                best1_ = dt_ if best1_ is None else min(best1_, dt_)
        finally:
            if saved is not None:
                _os.sched_setaffinity(0, saved)
        return best1_, mp_

    for _ in range(4):
        dt, mp, _ = host_stage(data, threads)
        best = dt if best is None else min(best, dt)
    best1, mp = _pinned_1t(data, 8)
    data_1k = make_stream(1024, dense=True)
    best_1k = None
    for _ in range(4):
        dt, mp1k, _ = host_stage(data_1k, threads)
        best_1k = dt if best_1k is None else min(best_1k, dt)
    best1_1k, mp1k = _pinned_1t(data_1k, 8)
    return (mp / best, mp / best1, mp1k / best_1k, mp1k / best1_1k)


def _bench_host_shapes() -> dict:
    """Host-stage (no device) throughput per lossless content shape,
    multi-threaded: used by the host-only fallback artifact."""
    import multiprocessing
    import time as _t

    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    threads = min(8, multiprocessing.cpu_count())
    rng = np.random.default_rng(6)
    # distinct names from the device corpus cases: different content
    # sizes and a different measured stage (host symbol decode only)
    shapes = {
        "host_modular_noisy_1024": [
            rng.integers(0, 256, (1024, 1024), dtype=np.int64)
            for _ in range(3)],
        "host_modular_rle_1024": [np.repeat(
            rng.integers(0, 256, (1024, 32), dtype=np.int64), 32, 1)
            for _ in range(3)],
    }
    out = {}
    for name, chans in shapes.items():
        enc = encode_jxl_modular(
            chans, bit_depth=8, lz77_rle=("rle" in name))

        def host_only():
            img = JxlImage(num_threads=threads)
            img.feed_bytes(enc)
            img.finish()
            fr = img._frames[0]
            fr.parse_lf_global()
            t0 = _t.perf_counter()
            fr.decode_modular_frame()
            return _t.perf_counter() - t0

        host_only()
        best = min(host_only() for _ in range(3))
        out[name] = round(1.048576 / best, 1)
    return out


def _bench_transfer() -> float:
    import jax

    # probe with 1 MiB first; only use a big buffer when the link is fast
    # (a congested tunnel at ~0.1 MiB/s would take 10+ min on 64 MiB)
    def roundtrip(mib: int, reps: int = 3) -> float:
        # best-of-N: a single roundtrip on the shared dev tunnel can hit
        # a congestion spike and under-report by 50x (seen: 0.6 MiB/s on
        # a link that sustains ~40 MiB/s)
        x = np.zeros((mib << 20,), dtype=np.uint8)
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            float(np.asarray(d[0]))  # force upload completion (see below)
            up = mib / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(d)
            down = mib / (time.perf_counter() - t0)
            best = max(best, min(up, down))
        return best

    jax.device_put(np.zeros(1024, np.uint8)).block_until_ready()  # warm
    probe = roundtrip(1)
    if probe > 16.0:
        return round(roundtrip(64, reps=2), 1)
    return round(probe, 3)


def _bench_compute_only(size: int = 2048) -> float:
    """Chip compute throughput with per-dispatch RPC latency cancelled:
    time K and 2K chained iterations (one dispatch each, lax.fori_loop)
    and take the paired difference — the constant dispatch/readback
    overhead subtracts out exactly, leaving K * t_iter."""
    import jax

    from __graft_entry__ import _chained_pipeline_fn, _synthetic_frame

    h = w = size
    k = 2048 if size <= 512 else 128
    fn1 = _chained_pipeline_fn(h, w, k)
    fn2 = _chained_pipeline_fn(h, w, 2 * k)
    args = [jax.device_put(a) for a in _synthetic_frame(h, w)]

    def run(fn):
        # scalar readback forces true completion: on the tunneled axon
        # platform block_until_ready returns before execution finishes,
        # which made async dispatch look like compute throughput
        return float(np.asarray(fn(*args)[0, 0, 0]))

    run(fn1)
    run(fn2)

    def best(fn, reps=3):
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(fn)
            dts.append(time.perf_counter() - t0)
        return min(dts)

    t1, t2 = best(fn1), best(fn2)
    diff = t2 - t1
    if diff < 0.05 * t2:
        # tunnel jitter swamped the pairing; fall back to the
        # conservative whole-dispatch estimate
        diff = t2 / 2.0
    return (h * w * k) / diff / 1e6


def _bench_stacked_vs_perimage(size: int = 512, k: int = 8) -> dict:
    """On-chip stacked-serving comparison (VERDICT r4 item 6): the SAME
    real fused program per-image vs vmapped over a K-stack, both timed
    with the chained K/2K latency-cancelling methodology (pure compute),
    plus the measured per-dispatch round-trip. The stacked mode's win is
    (K-1) saved dispatches minus any vmap compute overhead; both
    components are reported so the claim holds for any link latency."""
    import jax
    import jax.numpy as jnp

    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.serving import _host_stage_fast

    data = encode_jxl_vardct(_smooth_rgb(size, size, seed=21), gabor=True,
                             epf_iters=2)
    img = JxlImage.from_bytes(data)
    state, hf_global, fr, _alpha = _host_stage_fast(img, 0)
    parts = state.fused_program_parts(hf_global)
    assert parts is not None
    _key, make_fn, inputs = parts
    fn = make_fn()
    leaves, treedef = jax.tree.flatten(inputs)
    dev_leaves = [jax.device_put(x) for x in leaves]
    stacked_leaves = [
        jax.device_put(np.stack([x] * k)) for x in leaves
    ]

    def chained(f, n, stacked):
        # the input leaves MUST be jit ARGUMENTS: closing over device
        # arrays in a zero-arg jit makes them compile-time constants and
        # XLA folds the two (i & 1) parity variants into precomputed
        # frames — the loop then measures nothing (observed 4-6x
        # overread before this harness passed arguments)
        @jax.jit
        def run(*leaves):
            def body(i, acc):
                first = leaves[0] + (i & 1).astype(leaves[0].dtype)
                args = jax.tree.unflatten(
                    treedef, [first] + list(leaves[1:])
                )
                out = f(*args)
                # consume EVERY output element: reading one scalar lets
                # XLA dead-code-eliminate the other images/planes (the
                # CLAUDE.md all-channel-consumption hazard)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ls = (dev_leaves, stacked_leaves)[stacked]
        return lambda: run(*ls)

    vfn = jax.vmap(fn)
    # iteration counts sized so K*t_iter dwarfs per-dispatch jitter on
    # the tunnel (a 512^2 iteration is ~100 us; a 24-iteration chain's
    # K/2K difference drowned in the ~ms dispatch noise and swung the
    # per-image leg 4x between runs)
    n_s, n_k = 512, 64
    runners = {
        "s1": chained(fn, n_s, False), "s2": chained(fn, 2 * n_s, False),
        "k1": chained(vfn, n_k, True), "k2": chained(vfn, 2 * n_k, True),
    }
    for r in runners.values():
        float(np.asarray(r()))  # compile + warm
    best = {name: float("inf") for name in runners}
    for _ in range(4):
        for name in ("s1", "k1", "s2", "k2"):
            t0 = time.perf_counter()
            float(np.asarray(runners[name]()))
            best[name] = min(best[name], time.perf_counter() - t0)

    def diff(a, b, n):
        d = best[b] - best[a]
        return d if d > 0.05 * best[b] else best[b] / 2.0

    t_single = diff("s1", "s2", n_s) / n_s
    t_stack = diff("k1", "k2", n_k) / n_k
    # per-dispatch round trip (the quantity the stack divides by K)
    @jax.jit
    def one_consumed(*leaves):
        return jnp.sum(fn(*jax.tree.unflatten(treedef, list(leaves))))

    float(np.asarray(one_consumed(*dev_leaves)))
    disp = min(
        _time_once(lambda: float(np.asarray(one_consumed(*dev_leaves))))
        for _ in range(6)
    )
    px = size * size
    return {
        "k": k,
        "perimage_compute_mpps": round(px / t_single / 1e6, 1),
        "stacked_compute_mpps": round(k * px / t_stack / 1e6, 1),
        "stacked_compute_overhead": round(t_stack / (k * t_single), 3),
        "dispatch_roundtrip_ms": round((disp - t_single) * 1e3, 2),
        "note": "compute via chained K/2K pairs (latency cancelled); "
                "stacked serving saves (k-1) dispatch round-trips per "
                "stack at stacked_compute_overhead x compute cost",
    }


def _time_once(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _bench_modular_device(size: int = 2048) -> dict:
    """Device modular tail on-chip (VERDICT r4 item 1): the full default
    inverse-squeeze chain for a size^2 i32 plane as one jitted XLA
    program (ops/modular_tail.py), K/2K chained dispatches with the
    paired-difference latency cancellation, vs the host C++ path
    (jxlhost_inverse_squeeze_h) on identical data."""
    from measure_modular_device import device_rate, host_time

    dev = device_rate(size, k=4)
    host = size * size / host_time(size)
    return {
        "modular_device_mpps": round(dev / 1e6, 1),
        "modular_host_mpps_1t": round(host / 1e6, 1),
        "modular_device_speedup": round(dev / host, 1),
        "size": size,
    }


def _bench_jbr_reconstruct(size: int = 1024, reps: int = 4):
    """BASELINE config 5: JPEG bitstream reconstruction (jxl-jbr).
    Host-only: jbrd header + coefficients -> byte-exact JPEG via the
    native scan encoder. Uses the test harness's synthetic jbrd builder
    (tests/test_jbr.py), the same path the PIL-validated tests drive.
    Returns (restart-free serial MP/s, DRI-stream MP/s at all cores,
    DRI-stream MP/s 1 thread) — restart segments encode segment-parallel
    (VERDICT r4 item 10)."""
    sys.path.insert(0, "/root/repo/tests")
    from test_jbr import make_fake_frame, make_jbrd_box, make_jbrd_box_dri

    import jxl_oxide_tpu.utils.threads as th
    from jxl_oxide_tpu.jbr import JpegBitstreamData, reconstruct_jpeg

    rng = np.random.default_rng(12)
    h8 = w8 = size // 8
    lf = rng.integers(-40, 41, (h8, w8)).astype(np.int32)
    coeff = rng.integers(-6, 7, (size, size)).astype(np.int32)
    coeff[np.abs(coeff) < 5] = 0  # sparse AC, like real quantized scans
    quant = np.ones((8, 8), dtype=np.int32) * 4
    frame = make_fake_frame(size, size, lf, coeff, quant)
    jbrd = JpegBitstreamData(make_jbrd_box([0xC0, 0xC4, 0xDB, 0xDA, 0xD9]))
    jbrd_dri = JpegBitstreamData(make_jbrd_box_dri(w8))  # 1 row/segment

    def best_of(jb, threads):
        th.set_num_threads(threads)
        try:
            reconstruct_jpeg(jb, frame)  # warm
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                reconstruct_jpeg(jb, frame)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        finally:
            th.set_num_threads(None)
        return size * size / best / 1e6

    return (
        best_of(jbrd, 1),
        best_of(jbrd_dri, None or __import__("multiprocessing").cpu_count()),
        best_of(jbrd_dri, 1),
    )


def _device_available(timeout_s: float = 180.0) -> bool:
    """Probe the (possibly tunneled) device in a subprocess with a hard
    timeout: a hung tunnel must degrade to a host-only bench artifact,
    not swallow the whole run with a silent jax.devices() hang."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def main() -> None:
    host_mpps, host_mpps_1t, host_1k_mpps, host_1k_1t = _bench_host_entropy()
    print(f"host entropy stage (4096^2, 4 LF groups): {host_mpps:.1f} MP/s "
          f"({host_mpps_1t:.1f} MP/s/core single-thread; "
          f"1024^2 single-LF-group: {host_1k_mpps:.1f} / {host_1k_1t:.1f})",
          file=sys.stderr)
    try:
        jbr_mpps, jbr_dri_mpps, jbr_dri_1t = _bench_jbr_reconstruct()
    except Exception as e:  # pragma: no cover
        print(f"jbr bench failed: {e}", file=sys.stderr)
        jbr_mpps = jbr_dri_mpps = jbr_dri_1t = 0.0
    print(f"jpeg reconstruction: {jbr_mpps:.1f} MP/s (DRI stream: "
          f"{jbr_dri_mpps:.1f} all-core / {jbr_dri_1t:.1f} 1t)",
          file=sys.stderr)

    if not _device_available():
        print("device unreachable (tunnel down?) -- emitting host-only "
              "results", file=sys.stderr)
        # per-shape host-stage throughput so the artifact still carries a
        # content breakdown (the corpus e2e cases need the device)
        host_cases = {}
        try:
            host_cases = _bench_host_shapes()
        except Exception as e:  # pragma: no cover
            print(f"host shape bench failed: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "vardct_decode_per_chip",
            "value": 0.0,
            "unit": "Mpixel/s",
            "vs_baseline": 0.0,
            "device_unavailable": True,
            "host_entropy_mpps": round(host_mpps, 1),
            "host_entropy_mpps_per_core": round(host_mpps_1t, 1),
            "host_entropy_1024_mpps": round(host_1k_mpps, 1),
            "host_entropy_1024_mpps_per_core": round(host_1k_1t, 1),
            "host_cores": __import__("multiprocessing").cpu_count(),
            "host_cores_per_chip_at_1gpps": (
                round(__import__("multiprocessing").cpu_count()
                      * 1000.0 / host_mpps, 1) if host_mpps > 0 else 0.0
            ),
            "jbr_reconstruct_mpps": round(jbr_mpps, 1),
            "host_stage_cases_mpps": host_cases,
        }))
        return
    # transfer FIRST: the compute bench sizes its synthetic inputs by the
    # link speed (a 2048^2 arg set is ~60 MB — minutes on a congested
    # tunnel, nothing on a locally-attached chip)
    transfer = _bench_transfer()
    print(f"transfer: {transfer} MiB/s", file=sys.stderr)
    device_mpps = _bench_compute_only(2048 if transfer > 16 else 512)
    print(f"compute-only pipeline: {device_mpps:.1f} MP/s", file=sys.stderr)
    try:
        real_pipe_mpps, sharded_mpps = _bench_pipelines_pair(1024)
    except Exception as e:  # pragma: no cover
        print(f"pipeline pair bench failed: {e}", file=sys.stderr)
        real_pipe_mpps = sharded_mpps = 0.0
    print(f"real fused pipeline (gabor+EPF2): {real_pipe_mpps:.1f} MP/s",
          file=sys.stderr)
    eff_1chip = (
        round(sharded_mpps / real_pipe_mpps, 4)
        if sharded_mpps > 0 and real_pipe_mpps > 0 else 0.0
    )
    print(f"sharded program on 1 chip: {sharded_mpps:.1f} MP/s "
          f"(efficiency {eff_1chip})", file=sys.stderr)
    scaling = {
        "sharded_1chip_mpps": round(sharded_mpps, 1),
        "measured_efficiency_1chip": eff_1chip,
    }
    if sharded_mpps > 0:
        # halo model runs at the SHARDED per-chip rate; the total vs the
        # plain single-chip program compounds the measured structural
        # cost with the modeled (fully-exposed) halo cost
        model = _scaling_model(sharded_mpps)
        scaling.update(model)
        for n in (8, 32):
            scaling[f"modeled_total_efficiency_{n}chip"] = round(
                eff_1chip * model[f"modeled_efficiency_{n}chip"], 4)
    # second, independent leg for the model's structural assumption
    # (VERDICT r3 item 8): COUNTED per-device XLA flops of the real
    # sharded program at n=1/2/4/8 on the virtual CPU mesh. Runs in a
    # subprocess (the script pins jax to CPU itself); a 2048^2 frame has
    # 8 group rows, so all shard counts carry real work — the same run
    # at 1024^2 exposes the group-row granularity cliff (>4 shards on 4
    # group rows compute pure padding).
    try:
        import subprocess as _sp

        sv = _sp.run(
            [sys.executable, str(Path(__file__).parent
                                 / "tools" / "structural_scaling.py"),
             "--size", "2048"],
            capture_output=True, text=True, timeout=900,
        )
        line = sv.stdout.strip().splitlines()[-1]
        scaling["structural_validation"] = json.loads(line)
        print(f"structural validation (counted flops, 2048^2): "
              f"{scaling['structural_validation']['structural_work_ratio']}",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"structural validation failed: {e}", file=sys.stderr)

    try:
        stacked_pair = _bench_stacked_vs_perimage()
        print(f"stacked vs per-image (on-chip): "
              f"{stacked_pair['stacked_compute_mpps']} vs "
              f"{stacked_pair['perimage_compute_mpps']} MP/s compute, "
              f"dispatch {stacked_pair['dispatch_roundtrip_ms']} ms",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"stacked pair bench failed: {e}", file=sys.stderr)
        stacked_pair = {}
    try:
        modular_dev = _bench_modular_device()
    except Exception as e:  # pragma: no cover
        print(f"modular device bench failed: {e}", file=sys.stderr)
        modular_dev = {}
    if modular_dev:
        print(f"device modular tail (2048^2 squeeze chain): "
              f"{modular_dev['modular_device_mpps']:.1f} Msamples/s on-chip "
              f"vs {modular_dev['modular_host_mpps_1t']:.1f} host C++ 1t",
              file=sys.stderr)

    import os

    # overall wall-clock budget: a congested dev tunnel must not push the
    # run past the driver's timeout — later corpus cases shrink or skip
    budget = float(os.environ.get("JXL_BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()

    cases = _make_cases()
    results = {}
    results_dev = {}
    for name, (data, h, w) in cases.items():
        elapsed = time.perf_counter() - t_start
        remaining = budget - elapsed
        if remaining < 30 and name != "vardct_xyb":
            print(f"case {name}: skipped (budget)", file=sys.stderr)
            continue
        try:
            mpps = _bench_case(
                data, h, w,
                budget_s=max(30.0, remaining / 4),
            )
        except Exception as e:  # pragma: no cover
            print(f"case {name} failed: {e}", file=sys.stderr)
            mpps = 0.0
        results[name] = round(mpps, 2)
        try:
            mpps_dev = _bench_case_device_resident(data, h, w)
        except Exception as e:  # pragma: no cover
            print(f"case {name} device-resident failed: {e}",
                  file=sys.stderr)
            mpps_dev = 0.0
        results_dev[name] = round(mpps_dev, 2)
        print(f"case {name}: {mpps:.2f} MP/s "
              f"(device-resident {mpps_dev:.2f})", file=sys.stderr)

    flagship = cases["vardct_xyb"]
    if time.perf_counter() - t_start < budget - 30:
        dev_resident = _bench_device_resident(*flagship)
    else:
        dev_resident = 0.0
    print(f"device-resident serving: {dev_resident:.2f} MP/s", file=sys.stderr)
    if time.perf_counter() - t_start < budget - 30:
        serving_batched = _bench_serving_batched(*flagship)
    else:
        serving_batched = 0.0
    print(f"stacked-batch serving: {serving_batched:.2f} MP/s",
          file=sys.stderr)

    vals = [v for v in results.values() if v > 0]
    geomean = float(np.exp(np.mean(np.log(vals)))) if vals else 0.0
    e2e = results.get("vardct_xyb", 0.0)
    # flagship = per-chip throughput of the real fused decoder program
    # (the BASELINE target is stated per chip); fall back to the synthetic
    # pipeline if the capture failed so the artifact is never empty
    flagship_mpps = real_pipe_mpps if real_pipe_mpps > 0 else device_mpps
    print(json.dumps({
        "metric": "vardct_decode_per_chip",
        "value": round(flagship_mpps, 1),
        "unit": "Mpixel/s",
        "vs_baseline": round(flagship_mpps / 1000.0, 4),
        "host_entropy_mpps": round(host_mpps, 1),
        "host_entropy_mpps_per_core": round(host_mpps_1t, 1),
        "host_entropy_1024_mpps": round(host_1k_mpps, 1),
        "host_entropy_1024_mpps_per_core": round(host_1k_1t, 1),
        "host_cores": __import__("multiprocessing").cpu_count(),
        # host-CPU budget to feed ONE chip at the 1 Gpx/s target, scaled
        # from the measured all-core throughput of this box (dense VarDCT,
        # the worst-case content class). A v5p host has ~52 vCPU per chip.
        "host_cores_per_chip_at_1gpps": (
            round(__import__("multiprocessing").cpu_count()
                  * 1000.0 / host_mpps, 1) if host_mpps > 0 else 0.0
        ),
        "device_mpps": round(device_mpps, 1),
        "device_real_pipeline_mpps": round(real_pipe_mpps, 1),
        "modular_device_mpps": modular_dev.get("modular_device_mpps", 0.0),
        "modular_device": modular_dev,
        "scaling": scaling,
        "transfer_mbps": transfer,
        "e2e_tunnel_mpps": e2e,
        "e2e_device_resident_mpps": round(dev_resident, 2),
        "serving_batched_mpps": round(serving_batched, 2),
        "serving_stacked_vs_perimage": stacked_pair,
        "jbr_reconstruct_mpps": round(jbr_mpps, 1),
        "jbr_reconstruct_dri_mpps": round(jbr_dri_mpps, 1),
        "jbr_reconstruct_dri_mpps_1t": round(jbr_dri_1t, 1),
        "corpus_geomean_mpps": round(geomean, 2),
        "cases": results,
        "cases_device_resident": results_dev,
    }))


if __name__ == "__main__":
    main()
