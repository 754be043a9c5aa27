"""Public API facade: JxlImage, Render, pixel output.

Behavioral parity: jxl-oxide/src/lib.rs (JxlImage/JxlImageBuilder/Render)
and fb.rs (sample conversion). Push-based: feed bytes through the
container parser; headers/ICC parse eagerly, frame decode is lazy per
render call. Device work (filters, color transforms, VarDCT math) runs
under jax; the entropy stage is host-side.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .color.icc import decode_icc, read_icc
from .headers.frame import Encoding
from .headers.image import ColourEncoding, ColourSpace, ExtraChannelType, ImageHeader
from .io.bitstream import Bitstream
from .io.container import BitstreamKind, ContainerParser
from .render.context import KeyframeRender, RenderContext
from .render.frame import Frame
from .utils.errors import (
    JxlEofError,
    JxlError,
    JxlNotSupportedError,
    JxlValidationError,
)
from .utils.trace import traced

__all__ = ["JxlImage", "Render"]



def _is_jax(x) -> bool:
    try:
        import jax

        return isinstance(x, jax.Array)
    except ImportError:  # pragma: no cover
        return False


def _stack_channels(chans):
    """Stack [H, W] planes to [H, W, C]; stays on device when any plane
    is a jax array (single-download u8/u16 readback)."""
    if any(_is_jax(c) for c in chans):
        import jax.numpy as jnp

        return jnp.stack([jnp.asarray(c) for c in chans], axis=-1)
    return np.stack(chans, axis=-1)


@functools.lru_cache(maxsize=64)
def _finalize_fn(orientation: int, scale: float | None, dtype_name: str | None):
    """ONE jitted XLA program for the render tail: orientation + channel
    interleave + optional quantize. Chained eager jnp ops pay a dispatch
    round trip each (ruinous over a remote-chip link); this fuses them
    into a single async dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(chans):
        chans = [_apply_orientation(p, orientation) for p in chans]
        img = jnp.stack(chans, axis=-1)
        if scale is not None:
            img = jnp.clip(jnp.round(img * scale), 0, scale).astype(dtype_name)
        return img

    return f


@dataclass
class Render:
    """A rendered keyframe in the requested color encoding."""

    planes: list  # color planes after color transform, image-sized
    extra: list  # extra channel planes
    ec_info: list
    orientation: int
    name: str
    duration: int
    _spot_applied: bool = False

    def image_planar(self) -> list:
        """Color planes with orientation applied."""
        self.apply_spot_colors()
        return [_apply_orientation(p, self.orientation) for p in self.planes]

    def image_all_channels(self) -> np.ndarray:
        """[H, W, C] interleaved color + extra channels."""
        self.apply_spot_colors()
        chans = [*self.planes, *self.extra]
        if any(_is_jax(c) for c in chans):
            return np.asarray(_finalize_fn(self.orientation, None, None)(chans))
        return np.stack(
            [_apply_orientation(p, self.orientation) for p in chans], axis=-1
        )

    def image(self) -> np.ndarray:
        """[H, W, C] color (+ alpha if present)."""
        return np.asarray(self._image_device())

    def _output_chans(self) -> list:
        """Color planes + alpha (if present), un-oriented."""
        self.apply_spot_colors()
        chans = list(self.planes)
        for info, ec in zip(self.ec_info, self.extra):
            if info.ty == ExtraChannelType.ALPHA:
                chans.append(ec)
                break
        return chans

    def _image_device(self):
        """Like image() but stays on device for device-resident planes."""
        chans = self._output_chans()
        if any(_is_jax(c) for c in chans):
            return _finalize_fn(self.orientation, None, None)(chans)
        return _stack_channels(
            [_apply_orientation(p, self.orientation) for p in chans]
        )

    def apply_spot_colors(self) -> None:
        """Composite SpotColour extra channels onto the color planes
        (features/spot_colors.rs:5-37). Idempotent: every pixel output
        (to_u8/to_u16/image*/ImageStream/CLI) triggers it once, matching
        the facade's render semantics."""
        if self._spot_applied or len(self.planes) != 3:
            return
        self._spot_applied = True
        for info, ec in zip(self.ec_info, self.extra):
            if info.ty != ExtraChannelType.SPOT_COLOUR or not info.spot_colour:
                continue
            red, green, blue, solidity = info.spot_colour
            mix = ec * np.float32(solidity)
            for c, colv in enumerate((red, green, blue)):
                self.planes[c] = mix * np.float32(colv) + (1.0 - mix) * self.planes[c]

    def stream(self) -> "ImageStream":
        """Chunked interleaved sample stream with orientation and spot
        colors applied (fb.rs:170-398 ImageStream)."""
        return ImageStream(self)

    def to_u8(self) -> np.ndarray:
        return self._quantize(255.0, np.uint8)

    def to_u16(self) -> np.ndarray:
        return self._quantize(65535.0, np.uint16)

    def _quantize(self, scale: float, dtype) -> np.ndarray:
        chans = self._output_chans()
        if any(_is_jax(c) for c in chans):
            # orientation + interleave + quantize fuse into one device
            # dispatch; the readback is scale-bits wide instead of f32
            # (4x less transfer for u8 on slow links)
            out = _finalize_fn(
                self.orientation, float(scale), np.dtype(dtype).name
            )(chans)
            return np.asarray(out)
        img = self._image_device()
        return np.clip(np.round(img * scale), 0, scale).astype(dtype)


class ImageStream:
    """Incremental writer of interleaved samples into caller buffers
    (fb.rs ImageStream::write_to_buffer): row-major x-major c-minor order,
    u8/u16/f32 targets by buffer dtype, resumable across calls.

    Truly streaming (fb.rs:171-409): only the row band needed for the
    current call materializes — the full interleaved image is never built,
    and device-resident planes download slice by slice. Peak extra memory
    per call is O(rows_needed * width * channels)."""

    def __init__(self, render: Render):
        import copy

        r = copy.copy(render)
        r.planes = list(render.planes)
        r.apply_spot_colors()
        self._chans = [_apply_orientation(p, r.orientation) for p in r.planes]
        for info, ec in zip(r.ec_info, r.extra):
            self._chans.append(_apply_orientation(ec, r.orientation))
        self.height, self.width = self._chans[0].shape
        self.channels = len(self._chans)
        self._pos = 0

    def _row_band(self, r0: int, r1: int) -> np.ndarray:
        """Interleaved f32 samples of rows [r0, r1)."""
        rows = [
            np.asarray(c[r0:r1], dtype=np.float32) for c in self._chans
        ]
        return np.stack(rows, axis=-1).reshape(-1)

    def write_to_buffer(self, buf: np.ndarray) -> int:
        """Fill `buf` (1-D u8/u16/f32) with the next samples; returns the
        count written (0 at end of image)."""
        row_samples = self.width * self.channels
        total = self.height * row_samples
        n = min(buf.size, total - self._pos)
        if n <= 0:
            return 0
        written = 0
        while written < n:
            row = self._pos // row_samples
            off = self._pos - row * row_samples
            need = n - written
            r1 = min(self.height, row + -(-(off + need) // row_samples))
            band = self._row_band(row, r1)
            chunk = band[off : off + need]
            take = chunk.size
            if buf.dtype == np.uint8:
                buf[written : written + take] = np.clip(
                    np.round(chunk * 255.0), 0, 255
                )
            elif buf.dtype == np.uint16:
                buf[written : written + take] = np.clip(
                    np.round(chunk * 65535.0), 0, 65535
                )
            else:
                buf[written : written + take] = chunk
            written += take
            self._pos += take
        return n


def _orient_region_inverse(
    region: tuple[int, int, int, int], coded_w: int, coded_h: int,
    orientation: int,
) -> tuple[int, int, int, int]:
    """Map a display-space rect (left, top, w, h) into coded space: the
    inverse of _apply_orientation on regions (region.rs apply_orientation
    with inverse=true; jxl-oxide lib.rs:718-724 orients the requested
    region before cropping)."""
    left, top, width, height = region
    o = orientation
    if o == 1:
        r = (left, top, width, height)
    elif o == 2:
        r = (coded_w - left - width, top, width, height)
    elif o == 3:
        r = (coded_w - left - width, coded_h - top - height, width, height)
    elif o == 4:
        r = (left, coded_h - top - height, width, height)
    elif o == 5:
        # display = coded.T: display (y, x) = coded (x, y)
        r = (top, left, height, width)
    elif o == 6:
        # display = coded.T[:, ::-1]: display (y, x) = coded (H-1-x, y)
        r = (top, coded_h - left - width, height, width)
    elif o == 7:
        # display = coded.T[::-1, ::-1]: display (y, x) = coded (H-1-x, W-1-y)
        r = (coded_w - top - height, coded_h - left - width, height, width)
    elif o == 8:
        # display = coded.T[::-1, :]: display (y, x) = coded (x, W-1-y)
        r = (coded_w - top - height, left, height, width)
    else:
        raise JxlValidationError(f"invalid orientation {orientation}")
    # clamp to the coded plane
    l, t, w, h = r
    l2, t2 = max(0, l), max(0, t)
    w = max(0, min(l + w, coded_w) - l2)
    h = max(0, min(t + h, coded_h) - t2)
    return l2, t2, w, h


def _apply_orientation(plane: np.ndarray, orientation: int) -> np.ndarray:
    """EXIF orientation 1-8 (region.rs apply_orientation)."""
    if orientation == 1:
        return plane
    if orientation == 2:
        return plane[:, ::-1]
    if orientation == 3:
        return plane[::-1, ::-1]
    if orientation == 4:
        return plane[::-1, :]
    if orientation == 5:
        return plane.T
    if orientation == 6:
        return plane.T[:, ::-1]
    if orientation == 7:
        return plane.T[::-1, ::-1]
    if orientation == 8:
        return plane.T[::-1, :]
    raise JxlValidationError(f"invalid orientation {orientation}")


class JxlImage:
    """Streaming JPEG XL decoder.

    approx_memory_limit bounds decode-time plane allocations (the
    reference's AllocTracker / --approx-memory-limit)."""

    def __init__(self, approx_memory_limit: int | None = None,
                 num_threads: int | None = None,
                 force_wide_buffers: bool = False,
                 mesh=None):
        # mesh: a jax.sharding.Mesh; when given, VarDCT frames decode
        # through the sharded fused pipeline (group-row bands over the
        # mesh with ICI halo exchange, parallel/sharded.py). Output is
        # identical to the single-device path.
        self._decode_mesh = mesh
        # force_wide_buffers disables the narrow (i16) modular sample
        # lane even when modular_16bit_buffers is set in the header
        # (JxlImageBuilder, lib.rs:199-234; sample.rs:4-36).
        self._force_wide = bool(force_wide_buffers)
        if num_threads is not None:
            from .utils.threads import set_num_threads

            set_num_threads(num_threads)
        from .utils.alloc import AllocTracker

        self._tracker = (
            AllocTracker(approx_memory_limit) if approx_memory_limit else None
        )
        self._parser = ContainerParser()
        self._codestream = bytearray()
        self._aux_boxes: list[tuple[bytes, bytes, bool]] = []
        self._aux_current: list[bytes] | None = None
        self._aux_type: bytes = b""
        self.image_header: ImageHeader | None = None
        self.embedded_icc: bytes | None = None
        self._frames: list[Frame] = []
        self._frames_complete = False
        self._header_bs: Bitstream | None = None
        self._keyframe_cache: dict[int, KeyframeRender] = {}
        self.requested_encoding: ColourEncoding | None = None
        self.requested_icc: bytes | None = None
        self._image_region: tuple[int, int, int, int] | None = None
        self._progressive_ctx: RenderContext | None = None
        self._progressive_fed = 0
        from .color.cms import PilCms

        self._cms = PilCms()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes, **kwargs) -> "JxlImage":
        img = cls(**kwargs)
        img.feed_bytes(data)
        img.finish()
        return img

    @classmethod
    def open(cls, path, **kwargs) -> "JxlImage":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read(), **kwargs)

    def feed_bytes(self, data: bytes) -> None:
        for ev in self._parser.feed(data):
            self._handle_event(ev)
        try:
            self._try_init()
            self._load_frames(tolerate_truncation=True)
        except JxlEofError:
            pass  # headers not complete yet; keep feeding

    def finish(self) -> None:
        for ev in self._parser.finish():
            self._handle_event(ev)
        self._try_init()
        self._load_frames(tolerate_truncation=False)

    def _handle_event(self, ev) -> None:
        if ev.kind == "codestream":
            self._codestream += ev.data
        elif ev.kind == "aux_start":
            self._aux_current = []
            self._aux_type = ev.box_type
            self._aux_brotli = bool(getattr(ev, "brotli", False))
        elif ev.kind == "aux_data":
            if self._aux_current is not None:
                self._aux_current.append(ev.data)
        elif ev.kind == "aux_end":
            if self._aux_current is not None:
                self._aux_boxes.append(
                    (self._aux_type, b"".join(self._aux_current),
                     self._aux_brotli)
                )
                self._aux_current = None

    def _try_init(self) -> None:
        if self.image_header is not None:
            return
        bs = Bitstream(bytes(self._codestream))
        header = ImageHeader.parse(bs)
        icc = None
        if header.metadata.colour_encoding.want_icc:
            icc = decode_icc(read_icc(bs))
        # commit only once everything needed before frames has parsed
        self.image_header = header
        self.embedded_icc = icc
        self._header_bs = bs

    def _load_frames(self, tolerate_truncation: bool = False) -> None:
        if self._frames_complete or self.image_header is None:
            return
        bs = self._header_bs
        data = bytes(self._codestream)
        # the header bitstream snapshots the buffer; refresh it as new
        # codestream bytes stream in (push-based feed, jxl-oxide lib.rs)
        bs.data = data
        bs._len_bits = len(data) * 8

        # skip the preview frame if present (jxl-oxide lib.rs:384-411)
        if self.image_header.metadata.preview is not None and not getattr(
            self, "_preview_skipped", False
        ):
            save_pos = bs.pos
            try:
                preview = Frame(self.image_header, bs, is_preview=True)
            except JxlEofError:
                bs.pos = save_pos
                if tolerate_truncation:
                    return
                raise JxlValidationError("truncated codestream (preview)")
            end = preview.start_byte + preview.total_bytes
            if end > len(data):
                bs.pos = save_pos
                if tolerate_truncation:
                    return
                raise JxlValidationError("truncated codestream (preview)")
            bs.pos = end * 8
            self._preview_skipped = True
        # feed newly arrived bytes to the currently loading frame
        while True:
            if self._frames and not self._frames[-1].is_complete:
                frame = self._frames[-1]
                end = frame.start_byte + frame.total_bytes
                start = frame.start_byte + frame.data_start
                avail = data[start + len(frame.data) : min(end, len(data))]
                if avail:
                    frame.feed_bytes(avail)
                if not frame.is_complete:
                    if tolerate_truncation:
                        return
                    raise JxlValidationError("truncated codestream")
                bs.pos = end * 8
                if frame.header.is_last:
                    self._frames_complete = True
                    return
            # parse the next frame header
            save_pos = bs.pos
            try:
                frame = Frame(self.image_header, bs)
            except JxlEofError:
                bs.pos = save_pos
                if tolerate_truncation:
                    return
                raise JxlValidationError("truncated codestream")
            self._frames.append(frame)
            end = frame.start_byte + frame.total_bytes
            start = frame.start_byte + frame.data_start
            frame.feed_bytes(data[start : min(end, len(data))])
            if not frame.is_complete:
                if tolerate_truncation:
                    return
                raise JxlValidationError("truncated codestream")
            bs.pos = end * 8
            if frame.header.is_last:
                self._frames_complete = True
                return

    # -- metadata -----------------------------------------------------------

    @property
    def width(self) -> int:
        w = self.image_header.size.width
        return (
            self.image_header.size.height
            if self.image_header.metadata.orientation >= 5
            else w
        )

    @property
    def height(self) -> int:
        h = self.image_header.size.height
        return (
            self.image_header.size.width
            if self.image_header.metadata.orientation >= 5
            else h
        )

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    @property
    def num_keyframes(self) -> int:
        return sum(1 for f in self._frames if f.header.is_keyframe)

    @property
    def is_animation(self) -> bool:
        return self.image_header.metadata.animation is not None

    def request_color_encoding(self, encoding: ColourEncoding) -> None:
        # decoded keyframes are encoding-independent (the color transform
        # runs at postprocess time), so no cache invalidation is needed
        self.requested_encoding = encoding

    def request_icc(self, icc: bytes) -> None:
        """Render into the color space of the given ICC profile
        (jxl-oxide lib.rs:693-697). Enum-expressible profiles take the
        exact on-device enum transform; anything else runs the CMS leg.
        Raises JxlError if the profile cannot be read at all."""
        # Structural validity only (with_icc parse-failure semantics):
        # profiles that aren't enum-expressible are still fine — they take
        # the CMS leg at render time.
        if len(icc) < 132 or icc[36:40] != b"acsp":
            raise JxlError("invalid ICC profile")
        self.requested_icc = icc

    def rendered_icc(self) -> bytes:
        """ICC profile describing render output (lib.rs:547-555): the
        requested profile if one was set, else synthesized from the
        output colour encoding; ICC-described sources keep their
        embedded profile when no CMS is available to convert them."""
        if self.requested_icc is not None:
            return self.requested_icc
        from .color.synthesize import colour_encoding_to_icc

        meta = self.image_header.metadata
        source = meta.colour_encoding
        if source.want_icc and not meta.xyb_encoded:
            enum_src = None
            if self.embedded_icc:
                from .color.parse import parse_icc

                try:
                    enum_src = parse_icc(self.embedded_icc)
                except JxlError:
                    enum_src = None
            if enum_src is not None:
                return colour_encoding_to_icc(
                    self.requested_encoding or ColourEncoding()
                )
            from .color.cms import NullCms, srgb_icc

            if self._cms is None or isinstance(self._cms, NullCms):
                return self.embedded_icc or b""
            return srgb_icc()  # PilCms default target
        target = self.requested_encoding
        if target is None:
            target = (
                meta.colour_encoding if not meta.xyb_encoded else ColourEncoding()
            )
        return colour_encoding_to_icc(target)

    def rendered_cicp(self) -> tuple[int, int, int, int] | None:
        """CICP tag of the render output encoding, if enum-described
        (lib.rs:557-562)."""
        if self.requested_icc is not None:
            return None
        meta = self.image_header.metadata
        enc = self.requested_encoding
        if enc is None:
            if meta.xyb_encoded or meta.colour_encoding.want_icc:
                enc = ColourEncoding()
            else:
                enc = meta.colour_encoding
        return enc.cicp()

    def set_cms(self, cms) -> None:
        self._cms = cms

    # -- aux boxes / JPEG reconstruction ------------------------------------

    def aux_box(self, box_type: bytes) -> bytes | None:
        """Payload of the first aux box of the given type; brob-wrapped
        boxes (surfaced by the container parser under their inner type)
        decompress transparently (aux_box.rs brob handling)."""
        for ty, payload, is_brotli in self._aux_boxes:
            if ty != box_type:
                continue
            if is_brotli:
                from .utils.brotli import brotli_decompress

                return brotli_decompress(payload)
            return payload
        return None

    @property
    def raw_exif_data(self) -> bytes | None:
        """Exif payload with the 4-byte tiff-offset header stripped
        (aux_box.rs raw_exif)."""
        exif = self.aux_box(b"Exif")
        if exif is None:
            return None
        return exif[4:] if len(exif) >= 4 else b""

    @property
    def raw_xmp(self) -> bytes | None:
        """XMP metadata from the 'xml ' box (aux_box.rs)."""
        return self.aux_box(b"xml ")

    @property
    def hdr_gain_map(self) -> bytes | None:
        """Raw HDR gain map payload ('jhgm' box,
        container/box_header.rs:115)."""
        return self.aux_box(b"jhgm")

    @property
    def jpeg_reconstruction_available(self) -> bool:
        return self.aux_box(b"jbrd") is not None

    def reconstruct_jpeg(self) -> bytes:
        """Reconstruct the original JPEG byte stream from the jbrd box and
        the first VarDCT frame (jxl-oxide lib.rs:860-904)."""
        from .jbr import JpegBitstreamData, reconstruct_jpeg

        jbrd_payload = self.aux_box(b"jbrd")
        if jbrd_payload is None:
            raise JxlError("no jbrd box present")
        jbrd = JpegBitstreamData(jbrd_payload)
        if not self._frames:
            raise JxlError("no frame available")
        frame = self._frames[0]
        exif = self.aux_box(b"Exif") or b""
        if exif:
            exif = exif[4:]  # skip tiff offset header (aux_box.rs)
        xmp = self.aux_box(b"xml ") or b""
        icc = self.embedded_icc or b""
        return reconstruct_jpeg(jbrd, frame, icc=icc, exif=exif, xmp=xmp)

    # -- rendering ----------------------------------------------------------

    # -- lazy keyframe rendering -------------------------------------------
    #
    # render_frame(idx) renders only the dependency cone of that keyframe
    # (reference slots, LF frames, patch sources), releasing slots when
    # their last cone consumer is done — the reference's refcounted lazy
    # handle graph (jxl-render/src/lib.rs:284-440,488-607). Rendering
    # frame 0 of a long animation decodes only frame 0's dependencies.

    def _keyframe_global_indices(self) -> list[int]:
        return [
            i for i, f in enumerate(self._frames) if f.header.is_keyframe
        ]

    @staticmethod
    def _slot_reads(header) -> set[int]:
        """Reference slots a frame may read: blend sources per channel, or
        all four when the patches flag is set (patch targets live in
        LfGlobal, unknown before decode — conservative, like the
        reference's dependence wiring)."""
        if header.flags.patches:
            return {0, 1, 2, 3}
        reads: set[int] = set()
        binfo = header.blending_info
        from .headers.frame import BlendMode

        full_replace = (
            binfo.mode == BlendMode.REPLACE
            and not header.have_crop
            and all(
                e.mode == BlendMode.REPLACE for e in header.ec_blending_info
            )
        )
        if not full_replace:
            reads.add(binfo.source)
            for e in header.ec_blending_info:
                reads.add(e.source)
        return reads

    def _dependency_cone(self, target: int):
        """Frame indices (ascending) that must render for `target`, plus
        cached-keyframe canvases to seed reference slots from. The walk
        stops at keyframes whose composited canvas is already cached:
        the slot they save IS that canvas."""
        from .headers.frame import FrameType

        frames = self._frames
        needed = {target}
        # seed EVENTS keyed by (writer frame index, slot): applied at the
        # writer's position in the replay timeline, so a reader between
        # two writers of the same slot sees the right canvas (a slot can
        # be overwritten by later cached keyframes)
        # (writer_idx, slot) -> cached KeyframeRender. The OBJECT is pinned
        # here, not re-looked-up at apply time: the FIFO keyframe cache may
        # evict the entry while the cone renders new keyframes.
        seeds: dict[tuple[int, int], "KeyframeRender"] = {}
        kf_indices = self._keyframe_global_indices()
        kf_of_frame = {g: k for k, g in enumerate(kf_indices)}
        stack = [target]
        while stack:
            i = stack.pop()
            h = frames[i].header
            if h.flags.use_lf_frame:
                for j in range(i - 1, -1, -1):
                    hj = frames[j].header
                    if (
                        hj.frame_type == FrameType.LF_FRAME
                        and hj.lf_level == h.lf_level + 1
                    ):
                        if j not in needed:
                            needed.add(j)
                            stack.append(j)
                        break
            for s in self._slot_reads(h):
                for j in range(i - 1, -1, -1):
                    hj = frames[j].header
                    if hj.can_reference and hj.save_as_reference == s:
                        k = kf_of_frame.get(j)
                        cached_kf = (
                            self._cache_lookup(k) if k is not None else None
                        )
                        if cached_kf is not None and j not in needed:
                            # canvas == saved slot content
                            seeds[(j, s)] = cached_kf
                        elif j not in needed:
                            needed.add(j)
                            stack.append(j)
                        break
        return sorted(needed), seeds

    _KEYFRAME_CACHE_CAP = 8
    # BYTE-based bound on cached canvases (alloc_tracker.rs discipline: a
    # count cap alone lets 8 full-size canvases dwarf the decode budget).
    # With a decode memory limit configured, the cache is held to half of
    # it; otherwise to this default.
    _KEYFRAME_CACHE_MAX_BYTES = 512 << 20

    def _cache_key(self, keyframe_idx: int):
        # partial (ROI) decodes cache separately from full decodes
        return (keyframe_idx, self._image_region)

    def _cache_lookup(self, keyframe_idx: int):
        """Exact (idx, region) hit, else a cached FULL-region canvas —
        a full canvas satisfies any crop, so keyframes rendered by the
        progressive path (always full-region) are reused by ROI renders
        instead of re-decoding (reference: one render cache serves both,
        jxl-render/src/state.rs RenderCache)."""
        kf = self._keyframe_cache.get(self._cache_key(keyframe_idx))
        if kf is None and self._image_region is not None:
            kf = self._keyframe_cache.get((keyframe_idx, None))
        return kf

    @staticmethod
    def _kf_bytes(kf: KeyframeRender) -> int:
        return RenderContext._planes_bytes(kf.color) + RenderContext._planes_bytes(
            kf.extra
        )

    def _cache_store(self, key, kf: KeyframeRender) -> None:
        """FIFO-bounded keyframe canvas cache: tile-serving patterns with
        many distinct crop regions must not accumulate full-size canvases
        without bound. Bounded by count AND bytes; the newest entry always
        stays (it is the render being returned)."""
        cache = self._keyframe_cache
        cache[key] = kf
        max_bytes = self._KEYFRAME_CACHE_MAX_BYTES
        if self._tracker is not None:
            max_bytes = min(max_bytes, self._tracker.limit // 2)
        total = sum(self._kf_bytes(v) for v in cache.values())
        while len(cache) > 1 and (
            len(cache) > self._KEYFRAME_CACHE_CAP or total > max_bytes
        ):
            from .utils.alloc import release_alloc

            # evict the OLDEST insertion (dict preserves insertion order)
            oldest = next(iter(cache))
            old_kf = cache.pop(oldest)
            nb = self._kf_bytes(old_kf)
            total -= nb
            release_alloc(nb)

    def _coded_region(self):
        """The requested display-space region mapped into coded image
        coordinates (for section-level ROI pushdown)."""
        if self._image_region is None:
            return None
        return _orient_region_inverse(
            self._image_region,
            self.image_header.size.width,
            self.image_header.size.height,
            self.image_header.metadata.orientation,
        )

    def _render_keyframe(self, keyframe_idx: int) -> KeyframeRender:
        cached = self._cache_lookup(keyframe_idx)
        if cached is not None:
            return cached
        kf_indices = self._keyframe_global_indices()
        if keyframe_idx >= len(kf_indices):
            raise IndexError(keyframe_idx)
        target = kf_indices[keyframe_idx]
        cone, seeds = self._dependency_cone(target)

        import contextlib

        from .parallel import use_decode_mesh
        from .utils.alloc import use_tracker

        mesh_ctx = (
            use_decode_mesh(self._decode_mesh)
            if self._decode_mesh is not None
            else contextlib.nullcontext()
        )
        from .utils.options import use_force_wide

        wide_ctx = use_force_wide(self._force_wide)
        frames = self._frames
        # slot release plan: last cone frame reading each slot
        last_slot_read: dict[int, int] = {}
        last_lf_read: dict[int, int] = {}
        for i in cone:
            h = frames[i].header
            for s in self._slot_reads(h):
                last_slot_read[s] = i
            if h.flags.use_lf_frame:
                last_lf_read[h.lf_level] = i
        from .render.roi import use_decode_region

        with use_tracker(self._tracker), mesh_ctx, wide_ctx, use_decode_region(
            self._coded_region()
        ):
            ctx = RenderContext(self.image_header)

            # seed events in timeline order (applied just before the first
            # replayed frame AFTER the seed's writer position)
            seed_events = sorted(seeds.items())  # by (writer_idx, slot)
            seed_ptr = 0

            def _apply_seeds(upto: int) -> None:
                nonlocal seed_ptr
                while (
                    seed_ptr < len(seed_events)
                    and seed_events[seed_ptr][0][0] < upto
                ):
                    (_, s), kf = seed_events[seed_ptr]
                    ctx.set_reference(s, (
                        [np.asarray(p, dtype=np.float32).copy()
                         for p in kf.color],
                        [np.asarray(p, dtype=np.float32).copy()
                         for p in kf.extra],
                    ))
                    seed_ptr += 1
            # P3 frame pipelining: decode independent cone frames on
            # background threads (LF-dependent frames need their LF slot
            # first, so they render inline); compositing stays sequential
            # (jxl-render/src/lib.rs:488-607 background ref renderers)
            prerendered = {}
            parallel_ids = [
                i for i in cone
                if not frames[i].header.flags.use_lf_frame
            ]
            if len(parallel_ids) > 1:
                import concurrent.futures as cf
                import contextvars

                from .render.render import render_frame as _render_fr

                def _job(idx):
                    f = frames[idx]
                    return idx, _render_fr(
                        f, cache=getattr(f, "_progressive_cache", None)
                    )

                with cf.ThreadPoolExecutor(
                    max_workers=min(4, len(parallel_ids))
                ) as ex:
                    # one context snapshot per task: worker threads don't
                    # inherit contextvars (tracker/mesh/ROI/wide flags)
                    futs = [
                        ex.submit(contextvars.copy_context().run, _job, i)
                        for i in parallel_ids
                    ]
                    for fut in futs:
                        idx, fr = fut.result()
                        prerendered[idx] = fr
            for i in cone:
                _apply_seeds(i)
                frame = frames[i]
                # header-derived counters for skipped frames (noise seeds)
                ctx._frame_counter = i
                prev_kfs = [g for g in kf_indices if g < i]
                ctx._num_prev_keyframes = len(prev_kfs)
                ctx._last_keyframe_idx = prev_kfs[-1] if prev_kfs else None
                kf = ctx.add_frame(frame, fr=prerendered.get(i))
                if kf is not None:
                    self._cache_store(
                        self._cache_key(self._kf_index_of_frame(i)), kf
                    )
                # release slots with no remaining cone consumers
                for s in range(4):
                    if (
                        ctx.reference[s] is not None
                        and last_slot_read.get(s, -1) <= i
                    ):
                        ctx.release_slot(s)
                # LF slot `lvl` is read by frames whose lf_level == lvl
                # (writers have lf_level == lvl + 1)
                for lvl in range(4):
                    if (
                        ctx.lf_frames[lvl] is not None
                        and last_lf_read.get(lvl, -1) <= i
                    ):
                        ctx.release_lf_frame(lvl)
        result = self._cache_lookup(keyframe_idx)
        if result is None:  # target was not a keyframe (should not happen)
            raise JxlError("target frame did not produce a keyframe")
        return result

    def _kf_index_of_frame(self, global_idx: int) -> int:
        return sum(
            1 for i, f in enumerate(self._frames)
            if f.header.is_keyframe and i < global_idx
        )

    def render_frame(self, keyframe_idx: int = 0) -> Render:
        kf = self._render_keyframe(keyframe_idx)
        return self._postprocess(kf, crop=self._image_region)

    def render_frame_cropped(
        self, keyframe_idx: int, crop: tuple[int, int, int, int]
    ) -> Render:
        """Render one keyframe restricted to a display-space (left, top,
        width, height) region (jxl-oxide lib.rs render_frame_cropped):
        section-level ROI pushdown applies, and the image-wide region set
        by set_image_region is left untouched."""
        saved = self._image_region
        try:
            self._image_region = tuple(crop)
            kf = self._render_keyframe(keyframe_idx)
            return self._postprocess(kf, crop=self._image_region)
        finally:
            self._image_region = saved

    def set_image_region(self, left: int, top: int, width: int, height: int):
        """Request a cropped region of interest (jxl-oxide
        set_image_region). Applied to subsequent renders."""
        self._image_region = (left, top, width, height)

    def render_loading_frame(self) -> Render:
        """Progressive render of the currently loading frame using
        whatever sections are buffered (render_loading_frame,
        jxl-render/src/lib.rs:723-894).

        Decode state persists across feed_bytes: each call decodes only
        the sections that completed since the last call (the reference's
        RenderCache), and the partial frame composites through the real
        blend path (x0/y0 offsets, BlendingInfo against reference slots)
        after all earlier complete frames have been composited."""
        if not self._frames:
            raise JxlEofError("no frame data buffered yet")
        from .render.render import render_frame as _rf
        from .render.vardct import ProgressiveCache

        if self._progressive_ctx is None:
            self._progressive_ctx = RenderContext(self.image_header)
            self._progressive_fed = 0
        ctx = self._progressive_ctx
        # composite newly completed frames; completed keyframes land in
        # the shared keyframe cache under the FULL-region key so a later
        # render_frame() reuses them instead of re-decoding (one render
        # cache serves both paths, jxl-render/src/state.rs)
        while self._progressive_fed < len(self._frames):
            frame = self._frames[self._progressive_fed]
            if not frame.is_complete:
                break
            kf = ctx.add_frame(frame)
            if kf is not None:
                self._cache_store(
                    (self._kf_index_of_frame(self._progressive_fed), None),
                    kf,
                )
            self._progressive_fed += 1

        if self._progressive_fed >= len(self._frames):
            # nothing loading: newest keyframe is the progressive result
            if ctx.keyframes:
                return self._postprocess(
                    ctx.keyframes[-1], crop=self._image_region
                )
            raise JxlEofError("no renderable frame data yet")

        frame = self._frames[self._progressive_fed]
        cache = getattr(frame, "_progressive_cache", None)
        if cache is None:
            cache = frame._progressive_cache = ProgressiveCache()
        from .utils.options import use_force_wide

        with use_force_wide(self._force_wide):
            fr = _rf(frame, allow_partial=True, cache=cache)
        kf = ctx.composite_partial(fr, frame)
        return self._postprocess(kf, crop=self._image_region)

    _ct_cache: dict = {}

    def _cached_transform(self, source, target, meta):
        """Memoized ColorTransform (reference caches it on RenderContext,
        render/lib.rs:57). Process-wide: the jitted op-list program stays
        warm across images with the same encoding pair, not just across
        renders of one image."""
        key = (
            repr(source), repr(target),
            repr(meta.opsin_inverse_matrix), repr(meta.tone_mapping),
        )
        tr = JxlImage._ct_cache.get(key)
        if tr is None:
            from .color.convert import ColorTransform

            tr = ColorTransform.build(
                source, target, meta.opsin_inverse_matrix, meta.tone_mapping
            )
            if len(JxlImage._ct_cache) > 64:
                JxlImage._ct_cache.clear()
            JxlImage._ct_cache[key] = tr
        return tr

    @traced("Transform to requested color encoding")
    def _needs_full_frame_postprocess(self) -> bool:
        """Peak-detect HDR tone mapping (relative_to_max_display) reads
        whole-image luminance statistics, so the ROI crop can't move
        before the color tail (convert.rs:478-500 detect_peak)."""
        tm = self.image_header.metadata.tone_mapping
        return (
            tm is not None
            and getattr(tm, "relative_to_max_display", False)
            and getattr(tm, "intensity_target", 255.0) > 255.0
        )

    def _postprocess(self, kf: KeyframeRender, crop=None) -> Render:
        """postprocess_keyframe (render/lib.rs:884-994): YCbCr -> RGB,
        then color transform to the requested encoding."""
        meta = self.image_header.metadata
        frame_header = kf.frame.header
        color = [
            p if _is_jax(p) else np.asarray(p, dtype=np.float32)
            for p in kf.color
        ]
        extra_pre = list(kf.extra)

        # ROI: slice BEFORE the color tail — every op below is pointwise,
        # so cropping commutes, and a 16384^2 frame then color-transforms
        # and downloads only the requested pixels. Peak-detect tone
        # mapping reads whole-image statistics, so it keeps the full
        # planes (crop applied at the end as before).
        if crop is not None and not self._needs_full_frame_postprocess():
            ch, cw = color[0].shape
            left, top, width, height = _orient_region_inverse(
                crop, cw, ch, meta.orientation
            )
            color = [p[top : top + height, left : left + width] for p in color]
            extra_pre = [
                p[top : top + height, left : left + width] for p in extra_pre
            ]
            crop = None

        # Canvas already converted to the signaled encoding before blending
        # (convert_color_for_record, save_before_ct=false): skip YCbCr and
        # the color transform (postprocess_keyframe lib.rs:934 ct_done).
        if getattr(kf, "ct_done", False):
            extra = [np.asarray(p, dtype=np.float32) for p in extra_pre]
            if crop is not None:
                ch, cw = color[0].shape
                left, top, width, height = _orient_region_inverse(
                    crop, cw, ch, meta.orientation
                )
                color = [
                    p[top : top + height, left : left + width] for p in color
                ]
                extra = [
                    p[top : top + height, left : left + width] for p in extra
                ]
            return Render(
                planes=color,
                extra=extra,
                ec_info=list(meta.ec_info),
                orientation=meta.orientation,
                name=kf.name,
                duration=kf.duration,
            )

        if frame_header.do_ycbcr:
            from .ops.color import ycbcr_to_rgb

            cb, y, cr = color[0], color[1], color[2]
            r, g, b = ycbcr_to_rgb(cb, y, cr)
            color = [r, g, b]

        extra = [np.asarray(p, dtype=np.float32) for p in extra_pre]

        source = (
            ColourEncoding(colour_space=ColourSpace.XYB)
            if meta.xyb_encoded
            else meta.colour_encoding
        )
        if source.want_icc and not meta.xyb_encoded:
            # Enum-expressible ICC: use the on-device enum transform path
            # (icc/parse.rs parse_icc; jxl-render/src/lib.rs:210 icc_tf)
            enum_src = None
            if self.embedded_icc and self.requested_icc is None:
                from .color.parse import parse_icc

                try:
                    enum_src = parse_icc(self.embedded_icc)
                except JxlError:
                    enum_src = None
            if enum_src is not None:
                target = self.requested_encoding or ColourEncoding()
                tr = self._cached_transform(enum_src, target, meta)
                if not tr.is_noop:
                    color = list(tr.run(color))
            # ICC-described samples: CMS leg (cms.rs / lcms2 backend).
            # CMYK images carry the black channel as an EC.
            elif self.requested_icc is not None or self._cms is not None:
                black_idx = next(
                    (
                        i for i, info in enumerate(meta.ec_info)
                        if info.ty == ExtraChannelType.BLACK
                    ),
                    None,
                )
                planes_in = [np.asarray(p, dtype=np.float32) for p in color]
                if black_idx is not None:
                    planes_in.append(extra[black_idx])
                try:
                    tr = self._cms.prepare_transform(
                        self.embedded_icc, self.requested_icc
                    )
                    color = [
                        np.asarray(p, dtype=np.float32)
                        for p in tr.transform(planes_in)
                    ]
                except JxlNotSupportedError:
                    pass  # NullCms: keep ICC-described samples as-is
        else:
            target = self.requested_encoding
            icc_leg = None
            if self.requested_icc is not None:
                # ICC target on an enum/XYB source (lib.rs:693-697 +
                # jxl-render lib.rs:208): enum-expressible profiles take
                # the exact enum transform; otherwise render to sRGB and
                # run the CMS leg from a synthesized sRGB profile.
                from .color.parse import parse_icc

                try:
                    target = parse_icc(self.requested_icc)
                except JxlError:
                    target = ColourEncoding()  # sRGB connection space
                    icc_leg = self.requested_icc
            if target is None:
                target = (
                    meta.colour_encoding
                    if not meta.xyb_encoded
                    else ColourEncoding()
                )

            tr = self._cached_transform(source, target, meta)
            if not tr.is_noop:
                color = list(tr.run(color))
            if icc_leg is not None and self._cms is not None:
                from .color.cms import srgb_icc

                cms_tr = self._cms.prepare_transform(srgb_icc(), icc_leg)
                color = [
                    np.asarray(p, dtype=np.float32)
                    for p in cms_tr.transform(
                        [np.asarray(p, dtype=np.float32) for p in color]
                    )
                ]

        if crop is not None:
            # The requested region is in oriented/display space; map it
            # through the inverse orientation before slicing the coded
            # planes (jxl-oxide lib.rs:718-724 render_frame_cropped).
            ch, cw = color[0].shape  # no download: shape only
            left, top, width, height = _orient_region_inverse(
                crop, cw, ch, meta.orientation
            )
            color = [p[top : top + height, left : left + width] for p in color]
            extra = [p[top : top + height, left : left + width] for p in extra]
        return Render(
            planes=color,
            extra=extra,
            ec_info=list(meta.ec_info),
            orientation=meta.orientation,
            name=kf.name,
            duration=kf.duration,
        )


def clear_program_caches() -> None:
    """Release compiled XLA programs and pooled host buffers.

    Every distinct (geometry, filter params, dequant tables) key
    compiles a fresh fused program, and jax's internal LRU caches
    strongly hold recent executables (mmap'd JIT code sections) even
    after the decoder's per-image caches die — a long-running process
    decoding many HETEROGENEOUS streams accumulates mapped regions
    until `vm.max_map_count` (~65530) is exhausted, at which point
    LLVM's next JIT mmap fails. Call this periodically (every few
    thousand distinct-geometry decodes) in such workloads; steady-shape
    serving reuses cached programs and never needs it. The fuzzers
    (tools/fuzz_diff.py, tools/fuzz.py) call it on a fixed cadence.
    """
    import jax

    from .render import vardct as _vardct
    from .serving import decode_batch_stacked

    decode_batch_stacked.__dict__.pop("_cache", None)
    with _vardct._PLANE_POOL_LOCK:
        _vardct._PLANE_POOL.clear()
    jax.clear_caches()
