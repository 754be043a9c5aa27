"""Host entropy-stage microbenchmark: times ONLY the CPU symbol-decode
stage (TOC section parse -> HF coefficient planes) with no device work,
isolating the component the end-to-end bench can hide behind the link
(reference throughput reporting: jxl-oxide-cli/src/decode.rs:164-209).

Usage: python tools/bench_host.py [--threads N] [--size 1024] [--reps 3]
Prints one JSON line: {"host_entropy_mpps": ..., "threads": N, ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def make_stream(size: int, dense: bool = True) -> bytes:
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(3)
    if size > 2048:
        # multi-LF-group geometry (the encoder's single-LF-group envelope
        # ends at 2048): tile the REAL quantized coefficients of the
        # 1024^2 case so per-pixel token density matches the headline
        # stream exactly, while the TOC carries (size/2048)^2 LF groups +
        # per-256px-group sections — the layout where every host stage
        # (LF batch, HF batch) has parallel grain
        from encoder_vardct import encode_jxl_vardct_tiled

        from jxl_oxide_tpu import JxlImage
        from jxl_oxide_tpu.render.vardct import decode_vardct_frame

        base = make_stream(1024, dense=dense)
        img = JxlImage.from_bytes(base)
        frame = img._frames[0]
        decode_vardct_frame(frame, keep_coeffs=True)
        st = frame._vardct_state
        reps = size // 1024
        coeff = np.tile(np.stack(st.coeff_planes), (1, reps, reps))
        lf_q = np.tile(np.stack(st.lf_quant_planes), (1, reps, reps))
        hf_meta = st.lf_groups[0].hf_meta
        sel = np.tile(hf_meta.block_sel.astype(np.int64), (reps, reps))
        mul = np.tile(hf_meta.block_mul.astype(np.int64), (reps, reps))
        return encode_jxl_vardct_tiled(
            size, size, sel, mul, coeff.astype(np.int64),
            lf_q.astype(np.int64), epf_iters=2, gabor=True,
        )
    if dense:
        rgb = rng.random((size, size, 3)).astype(np.float32)
    else:
        base = rng.random((size // 16, size // 16, 3)).astype(np.float32)
        rgb = np.repeat(np.repeat(base, 16, 0), 16, 1)
    return encode_jxl_vardct(rgb)


def host_stage(data: bytes, threads: int):
    """Run the host entropy stage once; returns (seconds, megapixels)."""
    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.io.bitstream import Bitstream
    from jxl_oxide_tpu.render.vardct import (
        HfGlobal,
        VardctFrameState,
        parse_lf_group,
    )

    img = JxlImage(num_threads=threads)
    img.feed_bytes(data)
    img.finish()
    frame = img._frames[0]
    header = frame.header
    lf_global = frame.parse_lf_global()
    gmodular = lf_global.gmodular
    modular = gmodular.modular
    if modular is not None:
        mlf_groups, pass_groups = modular.prepare_groups(frame.pass_shifts)
    else:
        mlf_groups, pass_groups = {}, [{}]

    t0 = time.perf_counter()

    def _do_lf(lf_idx):
        entry = frame.toc.entry_for("lf_group", lf_idx)
        bs = Bitstream(frame.section_bytes(entry))
        return lf_idx, parse_lf_group(
            bs, frame.image_header, header, lf_global,
            lf_idx, mlf_groups.get(lf_idx),
        )

    def _do_hf_global():
        entry = frame.toc.entry_for("hf_global")
        return HfGlobal(Bitstream(frame.section_bytes(entry)),
                        frame.image_header, header, lf_global)

    # LF groups (native C++ batch when available — the real decode path)
    # with HfGlobal + the coefficient-plane zero-fill overlapping the
    # serial LF section on a background thread (the decode_vardct_frame
    # sequencing, VERDICT r4 item 5)
    from jxl_oxide_tpu.render.vardct import _decode_lf_groups_batch

    lf_jobs = list(range(header.num_lf_groups))
    if threads > 1:
        import concurrent.futures as cf

        from jxl_oxide_tpu.utils.threads import background_executor

        state = VardctFrameState(frame, defer_coeff=True)
        bg = background_executor()
        hf_fut = bg.submit(_do_hf_global)
        state.start_coeff_planes(bg)
        done = _decode_lf_groups_batch(frame, state, lf_global, lf_jobs,
                                       mlf_groups)
        lf_jobs = [i for i in lf_jobs if i not in done]
        state.ensure_coeff_planes()
        if lf_jobs:
            with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                for lf_idx, group in ex.map(_do_lf, lf_jobs):
                    state.place_lf_group(lf_idx, group)
        hf_global = hf_fut.result()
    else:
        state = VardctFrameState(frame)
        done = _decode_lf_groups_batch(frame, state, lf_global, lf_jobs,
                                       mlf_groups)
        lf_jobs = [i for i in lf_jobs if i not in done]
        for lf_idx in lf_jobs:
            state.place_lf_group(*_do_lf(lf_idx))
        hf_global = _do_hf_global()

    by_group = {}
    for p in range(header.passes.num_passes):
        for g in range(header.num_groups):
            by_group.setdefault(g, []).append((p, g))

    from jxl_oxide_tpu.render.vardct import _decode_pass_groups_batch

    leftover = _decode_pass_groups_batch(
        frame, state, hf_global, by_group, pass_groups, gmodular
    )

    def do_job(job):
        p, g = job
        entry = frame.toc.entry_for("group_pass", g, p)
        bs = Bitstream(frame.section_bytes(entry))
        state.decode_pass_group_hf(bs, hf_global, p, g)

    jobs = [j for job_list in leftover for j in job_list]
    if threads > 1 and jobs:
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(do_job, jobs))
    else:
        for job in jobs:
            do_job(job)
    dt = time.perf_counter() - t0
    mp = header.sample_width() * header.sample_height() / 1e6
    # recycle the planes (the real decode path pools them after the fused
    # dispatch); the next rep's zero-fill then reuses resident pages
    state._planes_poolable = True
    state.trim_coeff_planes()
    return dt, mp, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sparse", action="store_true")
    args = ap.parse_args()

    data = make_stream(args.size, dense=not args.sparse)
    best = None
    for _ in range(args.reps):
        dt, mp, _ = host_stage(data, args.threads)
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "host_entropy_mpps": round(mp / best, 2),
        "ms": round(best * 1e3, 1),
        "threads": args.threads,
        "size": args.size,
        "dense": not args.sparse,
        "stream_bytes": len(data),
    }))


if __name__ == "__main__":
    main()
