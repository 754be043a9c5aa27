"""Region-of-interest decode pushdown.

When a decode region is active, section decoders skip TOC sections whose
groups don't intersect the padded region (the reference decodes only
intersecting groups: jxl-render/src/region.rs + jxl-frame/src/lib.rs
adjust_region). The region is in CODED image coordinates (the caller maps
the display-space crop through the inverse orientation first) and is
padded here for the filter stencils (1px gaborish + up to 6px EPF,
jxl-frame/src/lib.rs:626-649).
"""

from __future__ import annotations

import contextlib
import contextvars

# (left, top, width, height) in coded image coordinates, or None
_decode_region: contextvars.ContextVar = contextvars.ContextVar(
    "jxl_decode_region", default=None
)

# filter stencil reach: 6px EPF (iters=3) + 1px gaborish, rounded up
FILTER_PAD = 8


def get_decode_region():
    return _decode_region.get()


@contextlib.contextmanager
def use_decode_region(region):
    token = _decode_region.set(region)
    try:
        yield
    finally:
        _decode_region.reset(token)


def frame_supports_roi(frame) -> bool:
    """Conservative gate: push the region into section selection only when
    skipped pixels cannot influence region pixels. Patches copy arbitrary
    rects between frames, noise reads 9 adjacent groups, frame upsampling
    and LF frames change coordinate scales, and modular squeeze mixes
    samples globally — all decode fully."""
    header = frame.header
    if header.upsampling != 1 or header.lf_level != 0:
        return False
    if header.flags.use_lf_frame or header.flags.noise or header.flags.patches:
        return False
    if any(u != 1 for u in header.ec_upsampling):
        return False
    if header.do_ycbcr and not header.flags.skip_adaptive_lf_smoothing:
        # the fused subsampled path (which implements the rect) requires
        # skip_adaptive_lf_smoothing; other ycbcr frames decode fully
        return False
    lf_global = getattr(frame, "lf_global", None)
    if lf_global is not None and lf_global.gmodular.modular is not None:
        from ..models.modular_transform import Squeeze

        for tr in lf_global.gmodular.modular.header.transforms:
            if isinstance(tr, Squeeze):
                return False
    return True


# device-rect padding: the crop edge behaves like a plane edge inside the
# fused program (adaptive LF smoothing skips the outermost LF row/col =
# 8px) and the pixel filters reach another 7px, so keep the ROI at least
# 8 + 7 px away from the rect border
DEVICE_RECT_PAD = 24


def device_rect(frame, state, region):
    """Group-aligned plane rect (x0, y0, x1, y1) covering the padded ROI,
    or None when the rect is (nearly) the whole plane. The fused device
    program then computes only this rect (region.rs pushdown past the
    host stage)."""
    header = frame.header
    left, top, w, h = region
    left -= header.x0
    top -= header.y0
    # full-resolution plane extent (plane_shapes[0] is channel x, which
    # is SMALLER than the frame for chroma-subsampled streams)
    ph, pw = state.height_rounded, state.width_rounded
    gd = header.group_dim
    x0 = max(0, left - DEVICE_RECT_PAD) // gd * gd
    y0 = max(0, top - DEVICE_RECT_PAD) // gd * gd
    x1 = min(pw, -(-(left + w + DEVICE_RECT_PAD) // gd) * gd)
    y1 = min(ph, -(-(top + h + DEVICE_RECT_PAD) // gd) * gd)
    if x1 <= x0 or y1 <= y0:
        return None
    if (x1 - x0) * (y1 - y0) * 2 >= pw * ph:
        return None  # covers most of the plane: not worth a special program
    return (x0, y0, x1, y1)


def group_intersects(frame, group_idx: int, region) -> bool:
    """Does a 256px pass group intersect the padded region (in frame
    coordinates: the image-space region translated by -x0/-y0)?"""
    header = frame.header
    left, top, w, h = region
    left -= header.x0
    top -= header.y0
    left -= FILTER_PAD
    top -= FILTER_PAD
    w += 2 * FILTER_PAD
    h += 2 * FILTER_PAD
    gd = header.group_dim
    gpr = header.groups_per_row
    gx, gy = group_idx % gpr, group_idx // gpr
    x0, y0 = gx * gd, gy * gd
    return not (
        x0 >= left + w or x0 + gd <= left or y0 >= top + h or y0 + gd <= top
    )


# adaptive LF smoothing reads 1 LF sample (8px) beyond the region and the
# pixel filters reach another 7px, so a skipped neighboring LF group could
# corrupt DC near its boundary; pad LF-group intersection generously
LF_GROUP_PAD = FILTER_PAD + 32


def lf_group_intersects(frame, lf_group_idx: int, region) -> bool:
    """Same for a 2048px LF group (padded further: LF smoothing reads
    neighboring LF samples across LF-group boundaries)."""
    header = frame.header
    left, top, w, h = region
    left -= header.x0 + LF_GROUP_PAD
    top -= header.y0 + LF_GROUP_PAD
    w += 2 * LF_GROUP_PAD
    h += 2 * LF_GROUP_PAD
    lgd = header.lf_group_dim
    lgpr = header.lf_groups_per_row
    gx, gy = lf_group_idx % lgpr, lf_group_idx // lgpr
    x0, y0 = gx * lgd, gy * lgd
    return not (
        x0 >= left + w or x0 + lgd <= left or y0 >= top + h or y0 + lgd <= top
    )
