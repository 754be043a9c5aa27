"""Frame header, passes, blending, restoration filter params, and TOC.

Behavioral parity: jxl-frame/src/header.rs:6-526 (field order + conditions),
jxl-frame/src/filter.rs (gabor/EPF params), jxl-frame/src/data/toc.rs:9-270
(entry count, optional Lehmer permutation, per-section sizes).

The TOC is the unit of host-side parallelism: every section is an independent
entropy stream (SURVEY.md §2.3), so the scheduler fans sections out to host
threads and batches their outputs into device tensors.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field

from ..coding.entropy import Decoder, read_permutation
from ..io.bitstream import Bitstream, U, unpack_signed
from ..utils.errors import JxlValidationError
from .image import BitDepth, ImageHeader, read_extensions, read_name

__all__ = [
    "BlendMode",
    "BlendingInfo",
    "Encoding",
    "EpfParams",
    "FrameFlags",
    "FrameHeader",
    "FrameType",
    "Gabor",
    "Passes",
    "RestorationFilter",
    "Toc",
    "TocEntry",
]


class FrameType(enum.Enum):
    REGULAR = 0
    LF_FRAME = 1
    REFERENCE_ONLY = 2
    SKIP_PROGRESSIVE = 3

    @property
    def is_normal(self) -> bool:
        return self in (FrameType.REGULAR, FrameType.SKIP_PROGRESSIVE)

    @property
    def is_progressive(self) -> bool:
        return self in (FrameType.REGULAR, FrameType.LF_FRAME)


class Encoding(enum.Enum):
    VARDCT = 0
    MODULAR = 1


class BlendMode(enum.Enum):
    REPLACE = 0
    ADD = 1
    BLEND = 2
    MUL_ADD = 3
    MUL = 4

    @property
    def use_alpha(self) -> bool:
        return self in (BlendMode.BLEND, BlendMode.MUL_ADD)


@dataclass(frozen=True)
class FrameFlags:
    value: int = 0

    @property
    def noise(self) -> bool:
        return bool(self.value & 0x1)

    @property
    def patches(self) -> bool:
        return bool(self.value & 0x2)

    @property
    def splines(self) -> bool:
        return bool(self.value & 0x10)

    @property
    def use_lf_frame(self) -> bool:
        return bool(self.value & 0x20)

    @property
    def skip_adaptive_lf_smoothing(self) -> bool:
        return bool(self.value & 0x80)


@dataclass
class Passes:
    num_passes: int = 1
    num_ds: int = 0
    shift: list[int] = field(default_factory=list)
    downsample: list[int] = field(default_factory=list)
    last_pass: list[int] = field(default_factory=list)

    @classmethod
    def parse(cls, bs: Bitstream) -> "Passes":
        num_passes = bs.read_u32(1, 2, 3, 4 + U(3))
        p = cls(num_passes=num_passes)
        if num_passes != 1:
            p.num_ds = bs.read_u32(0, 1, 2, 3 + U(1))
            p.shift = [bs.read_bits(2) for _ in range(num_passes - 1)]
            p.downsample = [bs.read_u32(1, 2, 4, 8) for _ in range(p.num_ds)]
            p.last_pass = [bs.read_u32(0, 1, 2, U(3)) for _ in range(p.num_ds)]
        return p

    def pass_shift(self, pass_idx: int) -> int:
        """Coefficient shift for a pass (0 for the last pass)."""
        if pass_idx + 1 < self.num_passes:
            return self.shift[pass_idx]
        return 0

    def downsample_for_pass(self, pass_idx: int) -> int:
        """Progressive downsampling level active up to this pass."""
        ds = 1
        for d, lp in zip(self.downsample, self.last_pass):
            if pass_idx <= lp:
                ds = max(ds, d)
        return ds


@dataclass
class BlendingInfo:
    mode: BlendMode = BlendMode.REPLACE
    alpha_channel: int = 0
    clamp: bool = False
    source: int = 0

    @classmethod
    def parse(
        cls,
        bs: Bitstream,
        have_extra: bool,
        resets_canvas_for_mode,
    ) -> "BlendingInfo":
        """resets_canvas_for_mode: BlendMode -> bool. The `source` field is
        present iff the *effective* mode (this one, or the main color mode for
        extra channels) does not reset the canvas (header.rs BlendingInfo)."""
        raw = bs.read_u32(0, 1, 2, 3 + U(2))
        if raw > 4:
            raise JxlValidationError("invalid blend mode")
        mode = BlendMode(raw)
        info = cls(mode=mode)
        if have_extra and mode.use_alpha:
            info.alpha_channel = bs.read_u32(0, 1, 2, 3 + U(3))
        if (have_extra and mode.use_alpha) or mode == BlendMode.MUL:
            info.clamp = bs.read_bool()
        if not resets_canvas_for_mode(mode):
            info.source = bs.read_bits(2)
        return info


EPF_SHARP_LUT_DEFAULT = (0.0, 1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7, 6 / 7, 1.0)
EPF_CHANNEL_SCALE_DEFAULT = (40.0, 5.0, 3.5)
GABOR_DEFAULT_WEIGHTS = ((0.115169525, 0.061248592),) * 3


@dataclass
class Gabor:
    enabled: bool = True
    weights: tuple = GABOR_DEFAULT_WEIGHTS

    @classmethod
    def parse(cls, bs: Bitstream) -> "Gabor":
        if not bs.read_bool():
            return cls(enabled=False)
        if not bs.read_bool():
            return cls()
        weights = []
        for _ in range(3):
            w = (bs.read_f16_as_f32(), bs.read_f16_as_f32())
            if abs(1.0 + (w[0] + w[1]) * 4.0) < 1.1920929e-07:
                raise JxlValidationError("gaborish weights give ~zero kernel")
            weights.append(w)
        return cls(enabled=True, weights=tuple(weights))


@dataclass
class EpfParams:
    iters: int = 2
    sharp_lut: tuple = EPF_SHARP_LUT_DEFAULT
    channel_scale: tuple = EPF_CHANNEL_SCALE_DEFAULT
    quant_mul: float = 0.46
    pass0_sigma_scale: float = 0.9
    pass2_sigma_scale: float = 6.5
    border_sad_mul: float = 2.0 / 3.0
    sigma_for_modular: float = 1.0

    @property
    def enabled(self) -> bool:
        return self.iters > 0

    @classmethod
    def parse(cls, bs: Bitstream, encoding: Encoding) -> "EpfParams":
        iters = bs.read_bits(2)
        if iters == 0:
            return cls(iters=0)
        p = cls(iters=iters)
        sharp_custom = bs.read_bool() if encoding == Encoding.VARDCT else False
        if sharp_custom:
            p.sharp_lut = tuple(bs.read_f16_as_f32() for _ in range(8))
        if bs.read_bool():  # weight custom
            p.channel_scale = tuple(bs.read_f16_as_f32() for _ in range(3))
            bs.read_bits(32)  # ignored
        if bs.read_bool():  # sigma custom
            if encoding == Encoding.VARDCT:
                p.quant_mul = bs.read_f16_as_f32()
            p.pass0_sigma_scale = bs.read_f16_as_f32()
            p.pass2_sigma_scale = bs.read_f16_as_f32()
            p.border_sad_mul = bs.read_f16_as_f32()
        if encoding == Encoding.MODULAR:
            p.sigma_for_modular = bs.read_f16_as_f32()
        return p


@dataclass
class RestorationFilter:
    gab: Gabor = field(default_factory=Gabor)
    epf: EpfParams = field(default_factory=EpfParams)

    @classmethod
    def parse(cls, bs: Bitstream, encoding: Encoding) -> "RestorationFilter":
        if bs.read_bool():  # all_default
            return cls()
        gab = Gabor.parse(bs)
        epf = EpfParams.parse(bs, encoding)
        read_extensions(bs)
        return cls(gab=gab, epf=epf)


_CROP_DIST = (U(8), 256 + U(11), 2304 + U(14), 18688 + U(30))


@dataclass
class FrameHeader:
    frame_type: FrameType = FrameType.REGULAR
    encoding: Encoding = Encoding.VARDCT
    flags: FrameFlags = field(default_factory=FrameFlags)
    do_ycbcr: bool = False
    jpeg_upsampling: tuple = (0, 0, 0)
    upsampling: int = 1
    ec_upsampling: list[int] = field(default_factory=list)
    group_size_shift: int = 1
    x_qm_scale: int = 3
    b_qm_scale: int = 2
    passes: Passes = field(default_factory=Passes)
    lf_level: int = 0
    have_crop: bool = False
    x0: int = 0
    y0: int = 0
    width: int = 0
    height: int = 0
    blending_info: BlendingInfo = field(default_factory=BlendingInfo)
    ec_blending_info: list[BlendingInfo] = field(default_factory=list)
    duration: int = 0
    timecode: int = 0
    is_last: bool = True
    save_as_reference: int = 0
    resets_canvas: bool = True
    save_before_ct: bool = False
    name: str = ""
    restoration_filter: RestorationFilter = field(default_factory=RestorationFilter)
    bit_depth: BitDepth = field(default_factory=BitDepth)
    encoded_color_channels: int = 3

    # ------------------------------------------------------------------

    @classmethod
    def parse(cls, bs: Bitstream, image_header: ImageHeader,
              is_preview: bool = False) -> "FrameHeader":
        meta = image_header.metadata
        h = cls()
        # the preview frame's canvas is the PreviewHeader size, not the
        # image size (jxl-oxide lib.rs:384-411 skips it with the preview
        # context; parsing it against the image size derives the wrong
        # group/TOC structure for multi-group images)
        if is_preview and meta.preview is not None:
            base_w, base_h = meta.preview.width, meta.preview.height
        else:
            base_w, base_h = image_header.size.width, image_header.size.height
        h.width = base_w
        h.height = base_h
        h.ec_upsampling = [1] * len(meta.ec_info)
        h.ec_blending_info = [BlendingInfo() for _ in meta.ec_info]
        h.bit_depth = meta.bit_depth
        h.x_qm_scale = 3 if meta.xyb_encoded else 2

        all_default = bs.read_bool()
        if not all_default:
            h.frame_type = FrameType(bs.read_bits(2))
            h.encoding = Encoding(bs.read_bits(1))
            h.flags = FrameFlags(bs.read_u64())
            if not meta.xyb_encoded:
                h.do_ycbcr = bs.read_bool()
            if h.do_ycbcr and not h.flags.use_lf_frame:
                h.jpeg_upsampling = tuple(bs.read_bits(2) for _ in range(3))
            if not h.flags.use_lf_frame:
                h.upsampling = bs.read_u32(1, 2, 4, 8)
                h.ec_upsampling = [
                    bs.read_u32(1, 2, 4, 8) for _ in meta.ec_info
                ]
            if h.encoding == Encoding.MODULAR:
                h.group_size_shift = bs.read_bits(2)
            if meta.xyb_encoded and h.encoding == Encoding.VARDCT:
                h.x_qm_scale = bs.read_bits(3)
                h.b_qm_scale = bs.read_bits(3)
            else:
                h.x_qm_scale = 2
            if h.frame_type != FrameType.REFERENCE_ONLY:
                h.passes = Passes.parse(bs)
            if h.frame_type == FrameType.LF_FRAME:
                h.lf_level = 1 + bs.read_bits(2)
            if h.frame_type != FrameType.LF_FRAME:
                h.have_crop = bs.read_bool()
            if h.have_crop and h.frame_type != FrameType.REFERENCE_ONLY:
                h.x0 = unpack_signed(bs.read_u32(*_CROP_DIST))
                h.y0 = unpack_signed(bs.read_u32(*_CROP_DIST))
            if h.have_crop:
                h.width = bs.read_u32(*_CROP_DIST)
                h.height = bs.read_u32(*_CROP_DIST)
            def resets_for(mode: BlendMode) -> bool:
                return cls._resets_canvas(
                    mode, h.have_crop, h.x0, h.y0, h.width, h.height,
                    base_w, base_h,
                )

            if h.frame_type.is_normal:
                have_extra = bool(meta.ec_info)
                h.blending_info = BlendingInfo.parse(bs, have_extra, resets_for)
                h.ec_blending_info = []
                resets_main = resets_for(h.blending_info.mode)
                for _ in meta.ec_info:
                    h.ec_blending_info.append(
                        BlendingInfo.parse(bs, have_extra, lambda _m: resets_main)
                    )
                # preview frames never code duration/timecode/is_last
                # (spec F.2: these fields are conditioned on !is_preview;
                # is_last defaults true for a regular preview frame)
                if meta.animation is not None and not is_preview:
                    h.duration = bs.read_u32(0, 1, U(8), U(32))
                if (meta.animation is not None
                        and meta.animation.have_timecodes and not is_preview):
                    h.timecode = bs.read_bits(32)
                if is_preview:
                    h.is_last = h.frame_type == FrameType.REGULAR
                else:
                    h.is_last = bs.read_bool()
            else:
                h.is_last = False
            if h.frame_type != FrameType.LF_FRAME and not h.is_last:
                h.save_as_reference = bs.read_bits(2)
            h.resets_canvas = cls._resets_canvas(
                h.blending_info.mode, h.have_crop, h.x0, h.y0, h.width,
                h.height, base_w, base_h,
            )
            if h.frame_type == FrameType.REFERENCE_ONLY or (
                h.resets_canvas
                and not h.is_last
                and (h.duration == 0 or h.save_as_reference != 0)
                and h.frame_type != FrameType.LF_FRAME
            ):
                h.save_before_ct = bs.read_bool()
            else:
                h.save_before_ct = not h.frame_type.is_normal
            h.name = read_name(bs)
            h.restoration_filter = RestorationFilter.parse(bs, h.encoding)
            read_extensions(bs)

        actually_grayscale = (
            h.encoding == Encoding.MODULAR
            and not h.do_ycbcr
            and not meta.xyb_encoded
            and meta.grayscale
        )
        h.encoded_color_channels = 1 if actually_grayscale else 3
        if (
            h.encoding == Encoding.VARDCT
            and any(h.jpeg_upsampling)
            and not h.flags.skip_adaptive_lf_smoothing
        ):
            # libjxl rejects this combination as an invalid bitstream
            # (adaptive LF smoothing needs equal-size LF planes; the
            # reference PANICS on it — generic/mod.rs:27 assert_eq on
            # in_x.len()==in_y.len() with per-channel shifted LF planes
            # from util.rs:150-152). Note subsampled + use_lf_frame is
            # structurally impossible: jpeg_upsampling is only coded
            # when !use_lf_frame (header.rs:25, parse above).
            raise JxlValidationError(
                "adaptive LF smoothing is incompatible with chroma "
                "subsampling"
            )
        return h

    @staticmethod
    def _resets_canvas(
        mode: BlendMode,
        have_crop: bool,
        x0: int,
        y0: int,
        width: int,
        height: int,
        image_w: int,
        image_h: int,
    ) -> bool:
        if mode != BlendMode.REPLACE:
            return False
        if not have_crop:
            return True
        if x0 > 0 or y0 > 0:
            return False
        return (x0 + width >= image_w) and (y0 + height >= image_h)

    # -- geometry -----------------------------------------------------------

    @property
    def is_keyframe(self) -> bool:
        return self.frame_type.is_normal and (self.is_last or self.duration != 0)

    @property
    def can_reference(self) -> bool:
        return (
            not self.is_last
            and (self.duration == 0 or self.save_as_reference != 0)
            and self.frame_type != FrameType.LF_FRAME
        )

    def sample_width(self, upsampling: int | None = None) -> int:
        w = self.width
        up = self.upsampling if upsampling is None else upsampling
        if up > 1:
            w = -(-w // up)
        if self.lf_level > 0:
            w = -(-w // (1 << (3 * self.lf_level)))
        return w

    def sample_height(self, upsampling: int | None = None) -> int:
        h = self.height
        up = self.upsampling if upsampling is None else upsampling
        if up > 1:
            h = -(-h // up)
        if self.lf_level > 0:
            h = -(-h // (1 << (3 * self.lf_level)))
        return h

    @property
    def group_dim(self) -> int:
        return 128 << self.group_size_shift

    @property
    def lf_group_dim(self) -> int:
        return self.group_dim * 8

    @property
    def groups_per_row(self) -> int:
        return -(-self.sample_width() // self.group_dim)

    @property
    def lf_groups_per_row(self) -> int:
        return -(-self.sample_width() // self.lf_group_dim)

    @property
    def num_groups(self) -> int:
        return self.groups_per_row * -(-self.sample_height() // self.group_dim)

    @property
    def num_lf_groups(self) -> int:
        return self.lf_groups_per_row * -(-self.sample_height() // self.lf_group_dim)

    def group_size_for(self, group_idx: int) -> tuple[int, int]:
        return self._size_for(self.group_dim, group_idx)

    def lf_group_size_for(self, lf_group_idx: int) -> tuple[int, int]:
        return self._size_for(self.lf_group_dim, lf_group_idx)

    def _size_for(self, dim: int, idx: int) -> tuple[int, int]:
        w, hgt = self.sample_width(), self.sample_height()
        stride = -(-w // dim)
        row, col = idx // stride, idx % stride
        gw = w % dim if (col >= w // dim) else dim
        gh = hgt % dim if (row >= hgt // dim) else dim
        return gw, gh

    def lf_group_idx_from_group_idx(self, group_idx: int) -> int:
        gpr = self.groups_per_row
        return (group_idx % gpr) // 8 + ((group_idx // gpr) // 8) * self.lf_groups_per_row


# ---------------------------------------------------------------------------
# TOC


@dataclass(frozen=True)
class TocEntry:
    kind: str  # 'all' | 'lf_global' | 'lf_group' | 'hf_global' | 'group_pass'
    index: int  # lf_group idx, or group idx for group_pass
    pass_idx: int
    offset: int  # byte offset from frame start
    size: int


@dataclass
class Toc:
    entries: list[TocEntry]  # in ORIGINAL (kind) order
    bitstream_order: list[int]  # entry indices in bitstream appearance order
    total_size: int
    num_lf_groups: int
    num_groups: int

    @property
    def is_single_entry(self) -> bool:
        return len(self.entries) <= 1

    def entry_for(
        self, kind: str, index: int = 0, pass_idx: int = 0
    ) -> TocEntry:
        if self.is_single_entry:
            return self.entries[0]
        if kind == "lf_global":
            return self.entries[0]
        if kind == "lf_group":
            return self.entries[1 + index]
        if kind == "hf_global":
            return self.entries[1 + self.num_lf_groups]
        if kind == "group_pass":
            return self.entries[
                2 + self.num_lf_groups + pass_idx * self.num_groups + index
            ]
        raise KeyError(kind)

    @classmethod
    def parse(cls, bs: Bitstream, header: FrameHeader, frame_start_byte: int = 0) -> "Toc":
        num_groups = header.num_groups
        num_lf_groups = header.num_lf_groups
        num_passes = header.passes.num_passes
        if num_groups == 1 and num_passes == 1:
            entry_count = 1
        else:
            entry_count = 1 + num_lf_groups + 1 + num_groups * num_passes
        if entry_count > 65536:
            raise JxlValidationError("too many TOC entries")

        permutation: list[int] | None = None
        if bs.read_bool():
            decoder = Decoder(bs, 8)
            decoder.begin(bs)
            permutation = read_permutation(bs, decoder, entry_count, 0)
            decoder.finalize()

        bs.zero_pad_to_byte()
        sizes = [
            bs.read_u32(U(10), 1024 + U(14), 17408 + U(22), 4211712 + U(30))
            for _ in range(entry_count)
        ]
        bs.zero_pad_to_byte()

        # Offsets in bitstream order, relative to the frame start.
        offsets = []
        acc = bs.pos // 8 - frame_start_byte
        for size in sizes:
            offsets.append(acc)
            acc += size
        total = sum(sizes)

        kinds: list[tuple[str, int, int]] = []
        if entry_count == 1:
            kinds.append(("all", 0, 0))
        else:
            kinds.append(("lf_global", 0, 0))
            for i in range(num_lf_groups):
                kinds.append(("lf_group", i, 0))
            kinds.append(("hf_global", 0, 0))
            for p in range(num_passes):
                for g in range(num_groups):
                    kinds.append(("group_pass", g, p))

        entries = []
        if permutation is not None:
            bitstream_to_original = [0] * entry_count
            for bs_idx, orig in enumerate(permutation):
                bitstream_to_original[orig] = bs_idx
            # entries[original_idx] takes bytes at bitstream slot permutation[original_idx]
            for orig_idx, (kind, index, pass_idx) in enumerate(kinds):
                slot = permutation[orig_idx]
                entries.append(
                    TocEntry(kind, index, pass_idx, offsets[slot], sizes[slot])
                )
            bitstream_order = bitstream_to_original
        else:
            for (kind, index, pass_idx), offset, size in zip(kinds, offsets, sizes):
                entries.append(TocEntry(kind, index, pass_idx, offset, size))
            bitstream_order = list(range(entry_count))

        return cls(
            entries=entries,
            bitstream_order=bitstream_order,
            total_size=total,
            num_lf_groups=num_lf_groups,
            num_groups=num_groups,
        )
