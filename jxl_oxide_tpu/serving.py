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

import numpy as np

from .api import JxlImage

__all__ = ["decode_batch", "decode_batch_stacked", "decode_iter"]

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


def _host_stage_fast(img: JxlImage, frame: int):
    """Run ONLY the host entropy stage of a stream in the stacked-serving
    envelope; returns (state, hf_global, frame_obj, alpha_plane|None) or
    None when the stream needs the general path. Envelope: one VarDCT
    keyframe (including do_ycbcr and chroma-subsampled
    4:2:0/4:2:2/4:4:0 — the dominant JPEG-transcode shape, and lossy +
    full-res integer ALPHA — the web-transparency shape, round 5), no
    other extra channels / features / upsampling / LF frames,
    orientation 1, non-grayscale, xyb or plain-enum color, no CMS
    legs — i.e. the image pipeline after the fused program is exactly
    ([ycbcr->rgb] -> color transform -> interleave -> quantize) with
    alpha passed through, which is pointwise/shape-agnostic and applies
    to a whole stacked batch at once."""
    from .headers.frame import Encoding
    from .io.bitstream import Bitstream
    from .render.render import _parse_integer_samples
    from .render.vardct import (
        HfGlobal,
        VardctFrameState,
        _decode_lf_groups_batch,
        _decode_pass_groups_batch,
        parse_lf_group,
    )

    from .headers.image import ColourSpace, ExtraChannelType

    meta = img.image_header.metadata
    ec_ok = len(meta.ec_info) <= 1 and all(
        info.ty == ExtraChannelType.ALPHA
        and info.dim_shift == 0
        and not info.bit_depth.is_float
        for info in meta.ec_info
    )
    if (
        frame != 0
        or img.num_keyframes != 1
        or meta.orientation != 1
        or not ec_ok
        # CMS only matters for ICC legs (requested_icc / want_icc below):
        # a default PilCms instance always exists on JxlImage, and gating
        # on its mere presence silently killed the whole fast envelope
        # (every image has one — found by the round-5 on-chip bench;
        # test_stacked_fast_envelope_engages pins engagement now)
        or img.requested_icc is not None
        or meta.colour_encoding.want_icc
        # grayscale collapses to one channel in the general path; the
        # stacked tail is fixed three-channel
        or meta.colour_encoding.colour_space == ColourSpace.GREY
    ):
        return None
    fr = img._frames[0]
    header = fr.header
    if (
        header.encoding != Encoding.VARDCT
        or header.upsampling != 1
        or header.lf_level != 0
        or header.flags.use_lf_frame
        or header.flags.patches
        or header.flags.splines
        or header.flags.noise
        or not header.is_last
        or header.x0 or header.y0
        # cropped frames composite onto the full canvas in the general
        # path; the stacked program returns frame-sized planes
        or header.sample_width() != img.image_header.size.width
        or header.sample_height() != img.image_header.size.height
    ):
        return None
    lf_global = fr.parse_lf_global()
    gmod = lf_global.gmodular
    modular = gmod.modular
    if modular is not None and not meta.ec_info:
        return None  # unexpected modular channels: general path
    if modular is not None:
        mlf_groups, pass_groups = modular.prepare_groups(fr.pass_shifts)
    else:
        mlf_groups, pass_groups = {}, [{}]

    state = VardctFrameState(fr)
    if fr.toc.is_single_entry:
        bs = fr._single_bs
        state.place_lf_group(0, parse_lf_group(
            bs, fr.image_header, header, lf_global, 0, mlf_groups.get(0)
        ))
        hf_global = HfGlobal(bs, fr.image_header, header, lf_global)
        for p in range(header.passes.num_passes):
            state.decode_pass_group_hf(bs, hf_global, p, 0)
            sub = (
                pass_groups[p].get(0) if p < len(pass_groups) else None
            )
            fr._decode_pass_group(bs, p, 0, sub, gmod)
    else:
        lf_jobs = list(range(header.num_lf_groups))
        done = _decode_lf_groups_batch(fr, state, lf_global, lf_jobs,
                                       mlf_groups)
        for lf_idx in (i for i in lf_jobs if i not in done):
            bs = Bitstream(fr.section_bytes(fr.toc.entry_for("lf_group", lf_idx)))
            state.place_lf_group(lf_idx, parse_lf_group(
                bs, fr.image_header, header, lf_global, lf_idx,
                mlf_groups.get(lf_idx),
            ))
        bs = Bitstream(fr.section_bytes(fr.toc.entry_for("hf_global")))
        hf_global = HfGlobal(bs, fr.image_header, header, lf_global)
        by_group: dict[int, list] = {}
        for p in range(header.passes.num_passes):
            for g in range(header.num_groups):
                by_group.setdefault(g, []).append((p, g))
        leftover = _decode_pass_groups_batch(
            fr, state, hf_global, by_group, pass_groups, gmod
        )
        for jobs in leftover:
            for p, g in jobs:
                bs = Bitstream(
                    fr.section_bytes(fr.toc.entry_for("group_pass", g, p))
                )
                state.decode_pass_group_hf(bs, hf_global, p, g)
                sub = (
                    pass_groups[p].get(g) if p < len(pass_groups) else None
                )
                fr._decode_pass_group(bs, p, g, sub, gmod)
    alpha = None
    if modular is not None:
        chans = modular.finish()
        ec_int = chans[gmod.extra_channel_from]
        alpha = _parse_integer_samples(
            np.asarray(ec_int), meta.ec_info[0].bit_depth
        )
    return state, hf_global, fr, alpha


def decode_batch_stacked(streams: Sequence[bytes], *, frame: int = 0,
                         output: str = "u8", num_workers: int = 8,
                         max_stack: int = 16, **builder_kwargs) -> list:
    """decode_batch with same-geometry images STACKED into shared device
    dispatches: host entropy stages fan out on threads, then images whose
    fused-program key matches run as ONE vmapped program + ONE color tail
    + ONE quantized readback — the fixed per-dispatch link cost divides
    by the stack size (the serving-shape win; VERDICT r3 item 5).

    Streams outside the fast envelope (non-VarDCT, grayscale, features,
    extra channels, ...) silently take the per-image decode_batch path;
    do_ycbcr and chroma-subsampled VarDCT are IN the envelope (the
    fused subsampled program + a stacked BT.601 leg).
    output: "u8" / "f32" (host readback) or "device" ([H, W, 3] f32
    slices of the shared stacked array, left on the accelerator — the
    TPU-ingest serving mode with ONE dispatch per stack and NO
    readback); other kinds fall back entirely."""
    import jax
    import numpy as np

    if output not in ("u8", "f32", "device"):
        return decode_batch(streams, frame=frame, output=output,
                            num_workers=num_workers, **builder_kwargs)
    streams = list(streams)
    results: list = [None] * len(streams)

    def _host(i):
        img = JxlImage.from_bytes(streams[i], **builder_kwargs)
        fast = None
        try:
            fast = _host_stage_fast(img, frame)
        except Exception:
            fast = None
        return i, img, fast

    with _cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        host_out = list(ex.map(_host, range(len(streams))))

    # group fast images by fused-program key
    groups: dict = {}
    slow: list = []
    for i, img, fast in host_out:
        if fast is None:
            slow.append(i)
            continue
        state, hf_global, fr, alpha = fast
        if state.subsampled:
            parts = state.fused_subsampled_program_parts(
                hf_global, copy_inputs=True
            )
        else:
            parts = state.fused_program_parts(hf_global)
        if parts is None:
            slow.append(i)
            continue
        key, make_fn, inputs = parts
        # parts inputs are copies of the coefficient planes: recycle the
        # planes into the pool for the next image's host stage
        state._planes_poolable = True
        state.trim_coeff_planes()
        # the group shares ONE color tail: fold the tail's identity into
        # the grouping key (program keys don't cover color metadata).
        # Input DTYPES are data-dependent (u16-delta vs i32 sparse
        # indices, i8/i16/i32 values) and np.stack silently promotes a
        # mixed pair — deltas read as absolute indices decode to garbage
        # — so they join the key too.
        meta = img.image_header.metadata
        tail_key = (
            meta.xyb_encoded, fr.header.do_ycbcr,
            repr(meta.colour_encoding),
            repr(meta.opsin_inverse_matrix), repr(meta.tone_mapping),
            repr(img.requested_encoding),
        )
        dtype_key = tuple(
            x.dtype.str for x in jax.tree.leaves(inputs)
        )
        has_alpha = alpha is not None
        groups.setdefault((key, tail_key, dtype_key, has_alpha), []).append(
            (i, img, state, make_fn, inputs, alpha)
        )

    _stacked_cache = decode_batch_stacked.__dict__.setdefault("_cache", {})
    for key, members in groups.items():
        for s0 in range(0, len(members), max_stack):
            # singleton chunks run through the same path (vmap over 1):
            # the host entropy stage already ran, so re-decoding from
            # bytes via the fallback would double the host work
            chunk = members[s0 : s0 + max_stack]
            n = len(chunk)
            batched = _stacked_cache.get((key, n))
            if batched is None:
                # the chunk's OWN builder — the bare `make_fn` name here
                # is the stale grouping-loop variable (the last fast
                # image's program: a mixed srgb+xyb batch quantized every
                # group with the last image's qm_scale)
                fn = chunk[0][3]()
                batched = jax.jit(jax.vmap(fn))
                if len(_stacked_cache) > 32:
                    _stacked_cache.clear()
                _stacked_cache[(key, n)] = batched
            stacked = jax.tree.map(
                lambda *xs: np.stack(xs), *[c[4] for c in chunk]
            )
            placed = jax.device_put(stacked)
            out = batched(*placed)  # [N, 3, h, w]
            alpha_stack = (
                jax.device_put(np.stack([c[5] for c in chunk]))
                if key[3] else None
            )
            # color tail on the whole stack (ops are pointwise/shape-
            # agnostic), then one interleave+quantize readback
            img0 = chunk[0][1]
            meta = img0.image_header.metadata
            from .headers.image import ColourEncoding, ColourSpace

            source = (
                ColourEncoding(colour_space=ColourSpace.XYB)
                if meta.xyb_encoded
                else meta.colour_encoding
            )
            target = img0.requested_encoding or ColourEncoding()
            tr = img0._cached_transform(source, target, meta)
            planes = [out[:, c] for c in range(3)]
            if chunk[0][2].frame.header.do_ycbcr:
                # BT.601 leg on the whole stack (pointwise); stream
                # channel order is [Cb, Y, Cr]
                from .ops.color import ycbcr_to_rgb

                planes = list(ycbcr_to_rgb(planes[0], planes[1], planes[2]))
            if not tr.is_noop:
                planes = list(tr.run(planes))
            if alpha_stack is not None:
                # alpha passes through the color tail untouched (the
                # per-image path interleaves color + alpha the same way)
                planes = planes + [alpha_stack]
            from .api import _finalize_fn

            if output == "u8":
                res = np.asarray(_finalize_fn(1, 255.0, "uint8")(planes))
            elif output == "f32":
                res = np.asarray(_finalize_fn(1, None, None)(planes))
            else:  # "device": interleave on device, no host readback
                res = _finalize_fn(1, None, None)(planes)
            for j, (i, *_rest) in enumerate(chunk):
                results[i] = res[j]

    if slow:
        slow_res = decode_batch([streams[i] for i in slow], frame=frame,
                                output=output, num_workers=num_workers,
                                **builder_kwargs)
        for i, r in zip(slow, slow_res):
            results[i] = r
    return results
