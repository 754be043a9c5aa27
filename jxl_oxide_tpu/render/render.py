"""Per-frame rendering: decode -> float planes -> filters -> features.

Behavioral parity: jxl-render/src/render.rs (render_frame) and
modular.rs/image.rs conversions. Output is a FrameRender: float32 planes
(color channels + extra channels) at frame sample size, before blending
and before the final color transform (which happen at keyframe
composition time, render/lib.rs postprocess_keyframe).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..headers.frame import Encoding
from ..utils.errors import JxlNotSupportedError
from ..utils.trace import traced

__all__ = ["FrameRender", "render_frame"]


@dataclass
class FrameRender:
    """Rendered (but not yet blended/color-transformed) frame data."""

    color: list  # float32 planes, frame sample size
    extra: list  # float32 planes per extra channel
    color_channels: int
    frame: object
    # features (patches) may pre-upsample EC planes to color resolution
    # before the final frame upsampling (image.rs:487-513 ec_to_color_only);
    # the remaining EC factor depends on which staging happened
    ec_at_color_res: bool = False
    upsampled: bool = False
    gray_converted_to_rgb: bool = False
    # color planes already converted to the signaled target encoding
    # (image.rs:266 ct_done): set by convert_color_for_record for blending
    # frames with save_before_ct=false, checked by postprocess to avoid a
    # second transform
    ct_done: bool = False


def _parse_integer_samples(arr: np.ndarray, bit_depth) -> np.ndarray:
    """Integer samples -> [0,1] floats (jxl-image lib.rs:458-487)."""
    if bit_depth.is_float:
        bits = bit_depth.bits_per_sample
        exp_bits = bit_depth.exp_bits
        if bits == 32 and exp_bits == 8:
            return arr.astype(np.uint32).view(np.float32).astype(np.float32)
        mantissa_bits = bits - exp_bits - 1
        u = arr.astype(np.int64) & ((1 << bits) - 1)
        sign = (u >> (bits - 1)) & 1
        exp = (u >> mantissa_bits) & ((1 << exp_bits) - 1)
        mant = u & ((1 << mantissa_bits) - 1)
        bias = (1 << (exp_bits - 1)) - 1
        val = np.ldexp(
            1.0 + mant / (1 << mantissa_bits), (exp - bias).astype(np.int32)
        )
        val = np.where(exp == 0, np.ldexp(mant / (1 << mantissa_bits), 1 - bias), val)
        return np.where(sign == 1, -val, val).astype(np.float32)
    div = (1 << bit_depth.bits_per_sample) - 1
    return arr.astype(np.float32) / np.float32(div)


_UP2_DEV = None


def _upsample2x_triangle_dev(plane, axis: int, size: int):
    """Device-resident twin of _upsample2x_triangle: keeps the plane on
    the TPU (one jitted op) instead of pulling float32 planes back over
    the host link just to interleave them."""
    global _UP2_DEV
    if _UP2_DEV is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("axis", "size"))
        def _up2(plane, axis: int, size: int):
            p = jnp.moveaxis(plane.astype(jnp.float32), axis, 0)
            prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
            nxt = jnp.concatenate([p[1:], p[-1:]], axis=0)
            a = 0.25 * prev + 0.75 * p
            b = 0.75 * p + 0.25 * nxt
            out = jnp.stack([a, b], axis=1).reshape(
                (2 * p.shape[0],) + p.shape[1:]
            )
            out = jnp.moveaxis(out, 0, axis)
            return jax.lax.slice_in_dim(out, 0, size, axis=axis)

        _UP2_DEV = _up2
    return _UP2_DEV(plane, axis, size)


def _upsample2x_triangle(plane: np.ndarray, axis: int, size: int) -> np.ndarray:
    """JPEG chroma 2x upsample with the 0.25/0.75 triangle filter
    (filter/ycbcr.rs apply_jpeg_upsampling_single): out[2j] leans on the
    previous sample, out[2j+1] on the next, edges clamped."""
    if not isinstance(plane, np.ndarray):
        import jax

        if isinstance(plane, jax.Array):
            return _upsample2x_triangle_dev(plane, axis, size)
    p = np.moveaxis(np.asarray(plane, dtype=np.float32), axis, 0)
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    a = 0.25 * prev + 0.75 * p
    b = 0.75 * p + 0.25 * nxt
    out = np.stack([a, b], axis=1).reshape((2 * p.shape[0],) + p.shape[1:])
    return np.moveaxis(out, 0, axis).take(range(size), axis=axis)


@traced("Render frame")
def render_frame(frame, lf_global=None, allow_partial: bool = False,
                 cache=None) -> FrameRender:
    """Decode + filter one frame. Returns planes at frame sample size.

    `cache` (a render.vardct.ProgressiveCache) persists decode state
    across calls for progressive rendering: only newly-complete sections
    decode on each call."""
    header = frame.header
    image_header = frame.image_header
    meta = image_header.metadata
    bit_depth = meta.bit_depth
    w = header.sample_width()
    h = header.sample_height()

    if header.encoding == Encoding.MODULAR:
        chans = frame.decode_modular_frame(
            allow_partial=allow_partial, cache=cache
        )
        lf_global = frame.lf_global
        gmodular = lf_global.gmodular
        ncolor = header.encoded_color_channels
        color_int = chans[:ncolor]
        extra_int = chans[gmodular.extra_channel_from:]

        if meta.xyb_encoded:
            # convert_modular_xyb (image.rs:148-188): stream order [y, x, b],
            # b += y, output [x*m_x, y*m_y, b*m_b] with m/128 scaling
            y, x, b = [c.astype(np.float64) for c in color_int[:3]]
            b = b + y
            m_x, m_y, m_b = (m / 128.0 for m in lf_global.lf_dequant)
            color = [
                (x * m_x).astype(np.float32),
                (y * m_y).astype(np.float32),
                (b * m_b).astype(np.float32),
            ]
        elif header.do_ycbcr:
            color = [_parse_integer_samples(c, bit_depth) for c in color_int]
        else:
            color = [_parse_integer_samples(c, bit_depth) for c in color_int]
        extra = [
            _parse_integer_samples(c, meta.ec_info[i].bit_depth)
            for i, c in enumerate(extra_int)
        ]  # per-EC bit depth (jxl-render image.rs:507-508)
        epf_sigma_grids = None
    else:
        from .vardct import decode_vardct_frame

        (cx, cy, cb), extra_int = decode_vardct_frame(
            frame, allow_partial=allow_partial, cache=cache
        )
        color = [cx, cy, cb]
        ncolor = 3
        extra = [
            _parse_integer_samples(c, meta.ec_info[i].bit_depth)
            for i, c in enumerate(extra_int)
        ]

    # YCbCr chroma upsampling (image.rs upsample_jpeg); the fused
    # subsampled device path upsamples in-program (planes arrive at full
    # resolution already — skip by shape)
    if header.do_ycbcr:
        ups = header.jpeg_upsampling
        hscale = any(v in (1, 2) for v in ups)
        vscale = any(v in (1, 3) for v in ups)
        for i in range(3):
            # channel i is stored h-subsampled iff ups[i] in (0, 3) and any
            # channel sets hscale; v-subsampled iff ups[i] in (0, 2)
            # (param.rs from_jpeg_upsampling)
            hs = hscale and ups[i] not in (1, 2)
            vs = vscale and ups[i] not in (1, 3)
            p = color[i]
            if hs and p.shape[1] < w:
                p = _upsample2x_triangle(p, 1, w)
            if vs and p.shape[0] < h:
                p = _upsample2x_triangle(p, 0, h)
            color[i] = p if p.shape == (h, w) else p[:h, :w]

    # crop to frame size (the fused VarDCT path crops inside its program;
    # skip identity slices — each is a device dispatch for jax planes)
    color = [p if p.shape == (h, w) else p[:h, :w] for p in color]

    gray_cloned = False
    rf = header.restoration_filter
    filters_done = (
        header.encoding == Encoding.VARDCT
        and getattr(frame, "_vardct_state", None) is not None
        and frame._vardct_state.filters_applied
    )
    need_filter = (rf.gab.enabled or rf.epf.enabled) and not filters_done
    if need_filter and len(color) < 3:
        color = [color[0]] * 3
        gray_cloned = True

    # filters stay device-resident: gabor/EPF are jitted stencils and the
    # planes flow on to blending + the color transform without a host sync
    if rf.gab.enabled and not filters_done:
        from ..ops.filters import apply_gabor

        color = list(apply_gabor(color, rf.gab.weights))

    if rf.epf.enabled and not filters_done:
        from ..ops.filters import apply_epf, sigma_map_from_blocks

        if header.encoding == Encoding.VARDCT:
            sigma = _assemble_epf_sigma(frame, h, w)
        else:
            sigma = np.full((h, w), rf.epf.sigma_for_modular, dtype=np.float32)
        out = apply_epf(color, sigma, rf.epf)
        color = [out[0], out[1], out[2]]

    if gray_cloned:
        color = color[:1]

    # Frame/EC upsampling does NOT happen here: the reference renders
    # features (patches/splines/noise) at sample resolution FIRST
    # (render.rs:138-149), then upsamples every channel to full size —
    # apply_frame_upsampling below runs after RenderContext's feature
    # pass.
    return FrameRender(
        color=list(color),
        extra=list(extra),
        color_channels=len(color),
        frame=frame,
        gray_converted_to_rgb=False,
    )


def _ec_factor(header, meta, i: int) -> int:
    """Total EC upsampling factor to full resolution: ec_upsampling <<
    dim_shift (render.rs:110-118 upsampling_factor)."""
    return (
        header.ec_upsampling[i] if i < len(header.ec_upsampling) else 1
    ) << meta.ec_info[i].dim_shift


def upsample_ec_to_color(fr) -> None:
    """Bring EC planes to the COLOR channels' current (sample)
    resolution before patch blending (render.rs:183, image.rs:487-513
    ec_to_color_only: each channel upsamples by its factor down to the
    color shift target). Two-stage EC upsampling (ec->color then
    color->full) is the reference's numerical behavior whenever patches
    are present — it differs from a one-shot ec->full upsample."""
    if fr.ec_at_color_res:
        return
    frame = fr.frame
    header = frame.header
    meta = frame.image_header.metadata
    th, tw = header.sample_height(), header.sample_width()
    for i in range(len(fr.extra)):
        eh, ew = fr.extra[i].shape
        if (eh, ew) == (th, tw):
            continue
        from ..ops.upsample import upsample_nonseparable

        factor = _ec_factor(header, meta, i) // header.upsampling
        fr.extra[i] = np.asarray(
            upsample_nonseparable(fr.extra[i], factor, meta)
        )[:th, :tw]
    fr.ec_at_color_res = True


def apply_frame_upsampling(fr) -> None:
    """Frame + EC non-separable upsampling to the full frame size,
    AFTER feature rendering (render.rs:149 upsample_nonseparable with
    target factor 0; features run at sample resolution in full-res
    coordinates, clipped). Idempotent per frame render."""
    if fr.upsampled:
        return
    fr.upsampled = True
    frame = fr.frame
    header = frame.header
    meta = frame.image_header.metadata
    target_h = header.sample_height(1)
    target_w = header.sample_width(1)
    if header.upsampling > 1:
        from ..ops.upsample import upsample_nonseparable

        fr.color = [
            upsample_nonseparable(p, header.upsampling, meta)[
                :target_h, :target_w
            ]
            for p in fr.color
        ]
    for i in range(len(fr.extra)):
        eh, ew = fr.extra[i].shape
        if (eh, ew) == (target_h, target_w):
            continue
        from ..ops.upsample import upsample_nonseparable

        # remaining factor: the full ec factor, or just the frame factor
        # when patches already staged the EC at color resolution
        factor = (
            header.upsampling
            if fr.ec_at_color_res
            else _ec_factor(header, meta, i)
        )
        fr.extra[i] = upsample_nonseparable(fr.extra[i], factor, meta)[
            :target_h, :target_w
        ]


def _assemble_epf_sigma(frame, h: int, w: int) -> np.ndarray:
    """Frame-wide per-pixel sigma map from per-LF-group epf_sigma grids."""
    header = frame.header
    rf = header.restoration_filter
    sigma_blocks = np.full(
        (-(-h // 8), -(-w // 8)), rf.epf.sigma_for_modular, dtype=np.float32
    )
    state = getattr(frame, "_vardct_state", None)
    if state is not None:
        lfg_per_row = header.lf_groups_per_row
        for lf_group_idx, group in state.lf_groups.items():
            if group.hf_meta is None:
                continue
            gx = lf_group_idx % lfg_per_row
            gy = lf_group_idx // lfg_per_row
            y0 = gy * header.group_dim
            x0 = gx * header.group_dim
            g = group.hf_meta.epf_sigma
            gh, gw = g.shape
            sh = sigma_blocks[y0 : y0 + gh, x0 : x0 + gw]
            sh[:, :] = g[: sh.shape[0], : sh.shape[1]]
    m = np.repeat(np.repeat(sigma_blocks, 8, axis=0), 8, axis=1)
    return np.ascontiguousarray(m[:h, :w])
