"""Render context: frame sequencing, reference slots, blending, postprocess.

Behavioral parity: jxl-render/src/lib.rs (RenderContext, postprocess_keyframe)
and blend.rs (blend_single kernels). Frames render independently
(render.py); keyframes composite onto the image canvas with the frame's
BlendingInfo against a saved reference slot, then the cached color
transform maps to the requested encoding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..headers.frame import BlendMode, FrameType
from ..utils.errors import JxlNotSupportedError
from .render import apply_frame_upsampling, render_frame, upsample_ec_to_color

__all__ = ["RenderContext", "KeyframeRender"]


@dataclass
class KeyframeRender:
    """A composited keyframe: color + extra channel planes at image size."""

    color: list
    extra: list
    frame: object
    name: str = ""
    duration: int = 0
    # color planes are already in the signaled target encoding (blend.rs:219
    # propagates the new frame's ct_done flag onto the composited canvas)
    ct_done: bool = False

    @property
    def color_channels(self) -> int:
        return len(self.color)


def _blend_planes(base, new, mode, x0, y0, base_alpha, new_alpha, clamp,
                  premultiplied, is_alpha_channel):
    """One channel blend (blend.rs:550-680). base is image-sized, new is
    frame-sized placed at (x0, y0). Modifies base in place."""
    ih, iw = base.shape
    fh, fw = new.shape
    # intersect frame rect with canvas
    sx0, sy0 = max(0, -x0), max(0, -y0)
    dx0, dy0 = max(0, x0), max(0, y0)
    w = min(fw - sx0, iw - dx0)
    h = min(fh - sy0, ih - dy0)
    if w <= 0 or h <= 0:
        return
    nv = new[sy0 : sy0 + h, sx0 : sx0 + w]
    bview = base[dy0 : dy0 + h, dx0 : dx0 + w]

    if mode == BlendMode.REPLACE:
        bview[:, :] = nv
    elif mode == BlendMode.ADD:
        bview += nv
    elif mode == BlendMode.MUL:
        s = np.clip(nv, 0.0, 1.0) if clamp else nv
        bview *= s
    elif mode == BlendMode.BLEND:
        na = new_alpha[sy0 : sy0 + h, sx0 : sx0 + w] if new_alpha is not None else None
        ba = (
            base_alpha[dy0 : dy0 + h, dx0 : dx0 + w]
            if base_alpha is not None
            else np.zeros_like(bview)
        )
        if is_alpha_channel:
            # MixAlpha (blend.rs mix_alpha): a_out = na + ba*(1-na)
            nval = np.clip(nv, 0.0, 1.0) if clamp else nv
            bview[:, :] = nval + bview * (1.0 - nval)
        elif na is None:
            bview[:, :] = nv
        else:
            na = np.clip(na, 0.0, 1.0) if clamp else na
            if premultiplied:
                bview[:, :] = nv + bview * (1.0 - na)
            else:
                mixed = 1.0 - (1.0 - na) * (1.0 - ba)
                recip = np.where(mixed > 0.0, 1.0 / np.where(mixed == 0, 1, mixed), 0.0)
                bview[:, :] = (na * nv + ba * bview * (1.0 - na)) * recip
    elif mode == BlendMode.MUL_ADD:
        na = new_alpha[sy0 : sy0 + h, sx0 : sx0 + w] if new_alpha is not None else None
        if is_alpha_channel:
            pass  # Skip (blend.rs MulAdd alpha channel)
        elif na is None:
            bview += nv
        else:
            na = np.clip(na, 0.0, 1.0) if clamp else na
            bview += na * nv
    else:
        raise JxlNotSupportedError(f"blend mode {mode}")


class RenderContext:
    """Sequences frames of one image, maintaining reference slots."""

    def __init__(self, image_header):
        self.image_header = image_header
        # canvas lives in CODED space; orientation applies at output
        # (region.rs apply_orientation, Render._apply_orientation)
        self.width = image_header.size.width
        self.height = image_header.size.height
        self.reference = [None] * 4  # saved frames (color+extra plane lists)
        self.lf_frames = [None] * 4
        self.keyframes: list[KeyframeRender] = []
        self._frame_counter = 0
        # noise-seed counters (features/noise.rs frame visibility): these
        # are header-derived, so a lazy cone render can set them directly
        # for frames it skips over
        self._num_prev_keyframes = 0
        self._last_keyframe_idx: int | None = None

    def _num_channels(self, frame):
        return frame.header.encoded_color_channels

    # -- tracked slot management (jxl-grid alloc_tracker.rs RAII release) --

    @staticmethod
    def _planes_bytes(value) -> int:
        if value is None:
            return 0
        if isinstance(value, tuple):
            planes = list(value[0]) + list(value[1])
        else:
            planes = list(value)
        # shape/dtype arithmetic only: np.asarray would download
        # device-resident planes just to count bytes
        total = 0
        for p in planes:
            n = 1
            for d in p.shape:
                n *= int(d)
            total += n * np.dtype(p.dtype).itemsize
        return total

    def set_reference(self, slot: int, value) -> None:
        from ..utils.alloc import release_alloc, track_alloc

        release_alloc(self._planes_bytes(self.reference[slot]))
        track_alloc(self._planes_bytes(value))
        self.reference[slot] = value

    def release_slot(self, slot: int) -> None:
        self.set_reference(slot, None)

    def set_lf_frame(self, level: int, planes) -> None:
        from ..utils.alloc import release_alloc, track_alloc

        release_alloc(self._planes_bytes(self.lf_frames[level]))
        track_alloc(self._planes_bytes(planes))
        self.lf_frames[level] = planes

    def release_lf_frame(self, level: int) -> None:
        self.set_lf_frame(level, None)

    def add_frame(self, frame, fr=None) -> KeyframeRender | None:
        """Render + composite one frame in codestream order. Returns the
        keyframe render if this frame is a keyframe.

        `fr` (a FrameRender) supplies a pre-rendered decode: the lazy cone
        renderer decodes independent frames on background threads (the
        reference's P3 frame pipelining, jxl-render/src/lib.rs:488-607)
        and hands the results in here for sequential compositing."""
        header = frame.header
        meta = self.image_header.metadata

        if header.frame_type == FrameType.LF_FRAME:
            # DC frame: rendered at 8^lf_level downsampling and stored for
            # frames that set use_lf_frame (render/lib.rs LF slots). An LF
            # frame may itself use the next LF level (lf_level chains).
            if header.flags.use_lf_frame:
                lf_planes = self.lf_frames[header.lf_level]
                if lf_planes is None:
                    raise JxlNotSupportedError(
                        f"use_lf_frame with empty LF slot {header.lf_level}"
                    )
                frame._lf_frame_planes = lf_planes
            if fr is None:
                fr = render_frame(frame)
            apply_frame_upsampling(fr)
            self.set_lf_frame(header.lf_level - 1, fr.color)
            self._frame_counter += 1
            return None

        if header.flags.use_lf_frame:
            lf_planes = self.lf_frames[header.lf_level]
            if lf_planes is None:
                raise JxlNotSupportedError(
                    f"use_lf_frame with empty LF slot {header.lf_level}"
                )
            frame._lf_frame_planes = lf_planes

        # resume from the frame's progressive cache when one exists: only
        # sections not already decoded during loading-frame renders decode
        if fr is None:
            fr = render_frame(
                frame, cache=getattr(frame, "_progressive_cache", None)
            )
        self._apply_features(fr, frame)
        apply_frame_upsampling(fr)
        self._convert_color_for_record(fr, frame)
        canvas_color, canvas_extra = self._composite(fr, frame)

        if header.can_reference:
            # reference slots are blended into / patched from on host
            self.set_reference(header.save_as_reference, (
                [np.asarray(p, dtype=np.float32).copy() for p in canvas_color],
                [np.asarray(p, dtype=np.float32).copy() for p in canvas_extra],
            ))

        if header.is_keyframe:
            from ..utils.alloc import track_alloc

            # only RETAINED canvases charge the budget (the per-frame
            # working canvas is transient; charging it leaked the budget
            # monotonically over long animations)
            track_alloc(self._planes_bytes(canvas_color)
                        + self._planes_bytes(canvas_extra))
            kf = KeyframeRender(
                color=canvas_color,
                extra=canvas_extra,
                frame=frame,
                name=header.name,
                duration=header.duration,
                ct_done=fr.ct_done,
            )
            self.keyframes.append(kf)
            self._num_prev_keyframes += 1
            self._last_keyframe_idx = self._frame_counter
            self._frame_counter += 1
            return kf
        self._frame_counter += 1
        return None

    def composite_partial(self, fr, frame) -> KeyframeRender:
        """Composite a (possibly partially decoded) frame through the real
        blend path — x0/y0 offsets, BlendingInfo against saved reference
        slots — WITHOUT mutating context state (no slot saves, no keyframe
        bookkeeping). The render_loading_frame contract
        (jxl-render/src/lib.rs:723-894 + image.rs:788-845)."""
        self._apply_features(fr, frame)
        apply_frame_upsampling(fr)
        self._convert_color_for_record(fr, frame)
        canvas_color, canvas_extra = self._composite(fr, frame)
        return KeyframeRender(
            color=canvas_color,
            extra=canvas_extra,
            frame=frame,
            name=frame.header.name,
            duration=frame.header.duration,
            ct_done=fr.ct_done,
        )

    def _apply_features(self, fr, frame) -> None:
        """Patches -> splines -> noise (render.rs render_features)."""
        header = frame.header
        lf_global = getattr(frame, "lf_global", None)
        if lf_global is not None and (
            lf_global.patches or lf_global.splines or lf_global.noise
        ):
            # features mutate planes in place on host; np.array copies
            # (np.asarray of a device array is a read-only view)
            fr.color = [np.array(p, dtype=np.float32) for p in fr.color]
            fr.extra = [np.array(p, dtype=np.float32) for p in fr.extra]
            base_corr = None
            if lf_global.vardct is not None:
                cc = lf_global.vardct.lf_chan_corr
                base_corr = (cc.base_correlation_x, cc.base_correlation_b)
            if lf_global.patches is not None:
                # patch blending needs EC planes at the color channels'
                # (sample) resolution first (render.rs:183 ec_to_color)
                upsample_ec_to_color(fr)
                fr.extra = [
                    np.array(p, dtype=np.float32) for p in fr.extra
                ]
                self._apply_patches(fr, lf_global.patches)
            if lf_global.splines is not None and fr.color_channels == 3:
                from .features import render_spline

                render_spline(
                    fr.color, lf_global.splines, base_corr,
                    header.width, header.height,
                )
            if lf_global.noise is not None and fr.color_channels == 3:
                from .features import render_noise

                frame_idx = self._frame_counter
                is_kf = header.is_keyframe
                visible = self._num_prev_keyframes + (1 if is_kf else 0)
                if is_kf:
                    invisible = 0
                elif self._last_keyframe_idx is None:
                    invisible = 1 + frame_idx
                else:
                    invisible = frame_idx - self._last_keyframe_idx
                render_noise(
                    fr.color, header, visible, invisible, base_corr,
                    lf_global.noise.lut,
                )

    def _convert_color_for_record(self, fr, frame) -> None:
        """Convert a frame's color to the signaled target encoding BEFORE
        blending/recording when save_before_ct is false (jxl-render
        render.rs:151 + image.rs:807 composite_preprocess +
        util.rs:311-375 convert_color_for_record). Blending frames in an
        xyb_encoded animation therefore composite in the signaled target
        space, matching the reference; sets fr.ct_done so the postprocess
        tail skips the second transform."""
        header = frame.header
        meta = self.image_header.metadata
        skip_blending = (not header.frame_type.is_normal) or header.resets_canvas
        if (
            fr.ct_done
            or header.save_before_ct
            or (header.is_last and skip_blending)
        ):
            return

        if header.do_ycbcr:
            # xyb_encoded = false here (spec: do_ycbcr implies non-XYB)
            from ..ops.color import ycbcr_to_rgb

            cb, y, cr = fr.color[0], fr.color[1], fr.color[2]
            r, g, b = ycbcr_to_rgb(cb, y, cr)
            from ..headers.image import ColourSpace

            if meta.colour_encoding.colour_space == ColourSpace.GREY:
                fr.color = [np.asarray(r, dtype=np.float32)]
                fr.color_channels = 1
            else:
                fr.color = [np.asarray(p, np.float32) for p in (r, g, b)]
            fr.ct_done = True
        elif meta.xyb_encoded:
            from ..headers.image import ColourSpace

            enc = meta.colour_encoding
            if enc.want_icc or enc.colour_space in (
                ColourSpace.XYB, ColourSpace.UNKNOWN,
            ):
                # want_icc: blending does not occur on the CMS leg;
                # XYB/Unknown target: nothing to convert to (util.rs:332-347)
                return
            from ..color.convert import ColorTransform

            tr = ColorTransform.build(
                type(enc)(colour_space=ColourSpace.XYB), enc,
                meta.opsin_inverse_matrix, meta.tone_mapping,
            )
            if not tr.is_noop:
                fr.color = [
                    np.asarray(p, dtype=np.float32) for p in tr.run(fr.color)
                ]
            fr.ct_done = True

    def _composite(self, fr, frame):
        """Blend the rendered frame onto its base canvas (blend.rs blend);
        returns (canvas_color, canvas_extra) image-sized planes."""
        header = frame.header
        meta = self.image_header.metadata
        ncolor = fr.color_channels
        nextra = len(fr.extra)
        binfo = header.blending_info
        full_replace = (
            binfo.mode == BlendMode.REPLACE
            and not header.have_crop
            and all(e.mode == BlendMode.REPLACE for e in header.ec_blending_info)
        )
        if full_replace and fr.color[0].shape == (self.height, self.width):
            # jax planes are immutable — no defensive copy (and no device
            # dispatch); numpy planes copy ONCE (np.array) since canvases
            # outlive the frame render they alias
            def _own_f32(p):
                if not isinstance(p, np.ndarray):
                    import jax.numpy as jnp

                    return jnp.asarray(p, jnp.float32)
                return np.array(p, dtype=np.float32)

            canvas_color = [_own_f32(p) for p in fr.color]
            canvas_extra = [_own_f32(p) for p in fr.extra]
        else:
            fr.color = [np.array(p, dtype=np.float32) for p in fr.color]
            fr.extra = [np.array(p, dtype=np.float32) for p in fr.extra]

            # Each blended channel derives its base slot, base alpha, and
            # premultiplied flag from its OWN BlendingInfo (blend.rs:218-232,
            # 353-354): color channels from binfo, each EC from its
            # ec_blending_info — sources and alpha channels may differ.
            def _base_color(src, ci):
                base = self.reference[src]
                if base is None or not base[0]:
                    return np.zeros((self.height, self.width), dtype=np.float32)
                planes = base[0]
                return planes[ci if ci < len(planes) else 0].copy()

            def _base_extra(src, ei):
                base = self.reference[src]
                if base is None or ei >= len(base[1]):
                    return np.zeros((self.height, self.width), dtype=np.float32)
                return base[1][ei].copy()

            def _base_alpha(src, alpha_idx):
                base = self.reference[src]
                if base is None or alpha_idx >= len(base[1]):
                    return None
                return base[1][alpha_idx]

            def _alpha_ctx(info):
                """(base_alpha, new_alpha, premultiplied) for one blend."""
                if not info.mode.use_alpha:
                    return None, None, False
                ai = info.alpha_channel
                base_a = _base_alpha(info.source, ai)
                new_a = fr.extra[ai] if ai < len(fr.extra) else None
                premul = bool(
                    meta.ec_info
                    and ai < len(meta.ec_info)
                    and meta.ec_info[ai].alpha_associated
                )
                return base_a, new_a, premul

            canvas_color = [_base_color(binfo.source, ci) for ci in range(ncolor)]
            canvas_extra = [
                _base_extra(header.ec_blending_info[ei].source, ei)
                for ei in range(nextra)
            ]

            base_a, new_a, premul = _alpha_ctx(binfo)
            for ci in range(ncolor):
                _blend_planes(
                    canvas_color[ci], fr.color[ci].astype(np.float32),
                    binfo.mode, header.x0, header.y0,
                    base_a, new_a, binfo.clamp, premul, False,
                )
            for ei in range(nextra):
                einfo = header.ec_blending_info[ei]
                base_a, new_a, premul = _alpha_ctx(einfo)
                is_alpha = (
                    einfo.mode.use_alpha and ei == einfo.alpha_channel
                )
                _blend_planes(
                    canvas_extra[ei], fr.extra[ei].astype(np.float32),
                    einfo.mode, header.x0, header.y0,
                    base_a, new_a, einfo.clamp, premul, is_alpha,
                )
        return canvas_color, canvas_extra

    # -- patches ------------------------------------------------------------

    def _apply_patches(self, fr, patches) -> None:
        """Blend patch rects from saved reference frames onto the frame's
        planes (blend.rs patch + from_patch_blending_info)."""
        from .features import PatchBlendMode

        meta = self.image_header.metadata
        for patch in patches.patches:
            ref = self.reference[patch.ref_idx]
            if ref is None:
                raise JxlNotSupportedError(
                    f"patch references empty slot {patch.ref_idx}"
                )
            ref_color, ref_extra = ref
            src_planes = list(ref_color) + list(ref_extra)
            dst_planes = list(fr.color) + list(fr.extra)
            ncolor = len(fr.color)

            for target in patch.patch_targets:
                for ci, blending in enumerate(target.blending[: len(dst_planes)]):
                    mode = blending.mode
                    if mode == PatchBlendMode.NONE:
                        continue
                    # channel index: blending[0] covers all color channels
                    chans = (
                        list(range(ncolor)) if ci == 0
                        else [ncolor + ci - 1]
                    )
                    alpha_idx = ncolor + blending.alpha_channel
                    for ch in chans:
                        self._patch_blend_one(
                            dst_planes, src_planes, ch, patch, target,
                            mode, alpha_idx, blending.clamp,
                            is_alpha=(ch == alpha_idx and mode.use_alpha),
                            premultiplied=bool(
                                meta.ec_info
                                and blending.alpha_channel < len(meta.ec_info)
                                and meta.ec_info[
                                    blending.alpha_channel
                                ].alpha_associated
                            ),
                        )

    @staticmethod
    def _patch_blend_one(dst_planes, src_planes, ch, patch, target, mode,
                         alpha_idx, clamp, is_alpha, premultiplied):
        from .features import PatchBlendMode as PB

        dst = dst_planes[ch]
        src = src_planes[ch]
        # source rect in the reference frame; dest position in this frame
        sh, sw = src.shape
        dh, dw = dst.shape
        x0, y0 = patch.x0, patch.y0
        w = min(patch.width, sw - x0)
        h = min(patch.height, sh - y0)
        dx0, dy0 = target.x, target.y
        if dx0 < 0 or dy0 < 0:
            sx_off, sy_off = max(0, -dx0), max(0, -dy0)
            x0 += sx_off
            y0 += sy_off
            w -= sx_off
            h -= sy_off
            dx0, dy0 = max(0, dx0), max(0, dy0)
        w = min(w, dw - dx0)
        h = min(h, dh - dy0)
        if w <= 0 or h <= 0:
            return
        s = src[y0 : y0 + h, x0 : x0 + w]
        d = dst[dy0 : dy0 + h, dx0 : dx0 + w]

        if mode == PB.REPLACE:
            d[:, :] = s
        elif mode == PB.ADD:
            d += s
        elif mode == PB.MUL:
            sv = np.clip(s, 0.0, 1.0) if clamp else s
            d *= sv
        else:
            swapped = mode in (PB.BLEND_BELOW, PB.MUL_ADD_BELOW)
            sa_plane = (
                src_planes[alpha_idx] if alpha_idx < len(src_planes) else None
            )
            da_plane = (
                dst_planes[alpha_idx] if alpha_idx < len(dst_planes) else None
            )
            sa = (
                sa_plane[y0 : y0 + h, x0 : x0 + w]
                if sa_plane is not None
                else np.zeros_like(s)
            )
            da = (
                da_plane[dy0 : dy0 + h, dx0 : dx0 + w]
                if da_plane is not None
                else np.zeros_like(d)
            )
            base_s, new_s = (s, d.copy()) if swapped else (d.copy(), s)
            base_a, new_a = (sa, da) if swapped else (da, sa)
            if clamp:
                new_a = np.clip(new_a, 0.0, 1.0)
            if mode in (PB.BLEND_ABOVE, PB.BLEND_BELOW):
                if is_alpha:
                    d[:, :] = new_a + base_a * (1.0 - new_a)
                elif premultiplied:
                    d[:, :] = new_s + base_s * (1.0 - new_a)
                else:
                    mixed = 1.0 - (1.0 - new_a) * (1.0 - base_a)
                    recip = np.where(
                        mixed > 0, 1.0 / np.where(mixed == 0, 1, mixed), 0.0
                    )
                    d[:, :] = (
                        new_a * new_s + base_a * base_s * (1.0 - new_a)
                    ) * recip
            else:  # MulAdd
                if is_alpha:
                    d[:, :] = base_s
                else:
                    d[:, :] = base_s + new_a * new_s
