"""Image header parsing (signature, SizeHeader, ImageMetadata).

Behavioral parity: jxl-image/src/lib.rs:25-202 (field order, U32
distributions, conditional fields, validation) and the color encoding enums of
jxl-image/src/color.rs:9-611. Parsed on host; pure Python (headers are tiny).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from ..io.bitstream import Bitstream, U, unpack_signed
from ..utils.errors import JxlValidationError

__all__ = [
    "AnimationHeader",
    "BitDepth",
    "ColourEncoding",
    "ColourSpace",
    "ExtraChannelInfo",
    "ExtraChannelType",
    "ImageHeader",
    "ImageMetadata",
    "OpsinInverseMatrix",
    "Primaries",
    "PreviewHeader",
    "RenderingIntent",
    "SizeHeader",
    "ToneMapping",
    "TransferFunction",
    "WhitePoint",
    "read_name",
]


def read_name(bs: Bitstream) -> str:
    n = bs.read_u32(0, U(4), 16 + U(5), 48 + U(10))
    data = bytes(bs.read_bits(8) for _ in range(n))
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        raise JxlValidationError("non-UTF-8 name") from None


def read_extensions(bs: Bitstream) -> int:
    """Parse and skip extension payloads (jxl-image/src/lib.rs:214-236)."""
    extension_bits = bs.read_u64()
    lengths = []
    bits = extension_bits
    for _ in range(64):
        if bits & 1:
            lengths.append(bs.read_u64())
        bits >>= 1
    for ln in lengths:
        bs.skip_bits(ln)
    return extension_bits


# ---------------------------------------------------------------------------
# Size headers


@dataclass
class SizeHeader:
    width: int = 0
    height: int = 0

    @staticmethod
    def _ratio_width(ratio: int, height: int) -> int:
        return [
            0,
            height,
            height * 12 // 10,
            height * 4 // 3,
            height * 3 // 2,
            height * 16 // 9,
            height * 5 // 4,
            height * 2,
        ][ratio]

    @classmethod
    def parse(cls, bs: Bitstream) -> "SizeHeader":
        div8 = bs.read_bool()
        if div8:
            height = 8 * (1 + bs.read_bits(5))
        else:
            height = bs.read_u32(1 + U(9), 1 + U(13), 1 + U(18), 1 + U(30))
        ratio = bs.read_bits(3)
        if ratio == 0:
            if div8:
                width = 8 * (1 + bs.read_bits(5))
            else:
                width = bs.read_u32(1 + U(9), 1 + U(13), 1 + U(18), 1 + U(30))
        else:
            width = cls._ratio_width(ratio, height)
        return cls(width=width, height=height)


@dataclass
class PreviewHeader:
    width: int = 0
    height: int = 0

    @classmethod
    def parse(cls, bs: Bitstream) -> "PreviewHeader":
        div8 = bs.read_bool()
        if div8:
            height = 8 * bs.read_u32(16, 32, 1 + U(5), 33 + U(9))
        else:
            height = bs.read_u32(1 + U(6), 65 + U(8), 321 + U(10), 1345 + U(12))
        ratio = bs.read_bits(3)
        if ratio == 0:
            if div8:
                width = 8 * bs.read_u32(16, 32, 1 + U(5), 33 + U(9))
            else:
                width = bs.read_u32(1 + U(6), 65 + U(8), 321 + U(10), 1345 + U(12))
        else:
            width = SizeHeader._ratio_width(ratio, height)
        return cls(width=width, height=height)


@dataclass
class AnimationHeader:
    tps_numerator: int = 0
    tps_denominator: int = 0
    num_loops: int = 0
    have_timecodes: bool = False

    @classmethod
    def parse(cls, bs: Bitstream) -> "AnimationHeader":
        return cls(
            tps_numerator=bs.read_u32(100, 1000, 1 + U(10), 1 + U(30)),
            tps_denominator=bs.read_u32(1, 1001, 1 + U(8), 1 + U(10)),
            num_loops=bs.read_u32(0, U(3), U(16), U(32)),
            have_timecodes=bs.read_bool(),
        )


# ---------------------------------------------------------------------------
# Bit depth


@dataclass(frozen=True)
class BitDepth:
    bits_per_sample: int = 8
    exp_bits: int = 0  # 0 => integer samples; >0 => float samples

    @property
    def is_float(self) -> bool:
        return self.exp_bits > 0

    @classmethod
    def parse(cls, bs: Bitstream) -> "BitDepth":
        if bs.read_bool():
            bits = bs.read_u32(32, 16, 24, 1 + U(6))
            exp_bits = bs.read_bits(4) + 1
            if not (2 <= exp_bits <= 8):
                raise JxlValidationError("invalid exp_bits")
            mantissa = bits - (exp_bits + 1)
            if not (2 <= mantissa <= 23):
                raise JxlValidationError("invalid mantissa bits")
            return cls(bits_per_sample=bits, exp_bits=exp_bits)
        bits = bs.read_u32(8, 10, 12, 1 + U(6))
        if bits > 31:
            raise JxlValidationError("invalid bits_per_sample")
        return cls(bits_per_sample=bits, exp_bits=0)


# ---------------------------------------------------------------------------
# Color encoding enums (jxl-image/src/color.rs)


class ColourSpace(enum.Enum):
    RGB = 0
    GREY = 1
    XYB = 2
    UNKNOWN = 3


class RenderingIntent(enum.Enum):
    PERCEPTUAL = 0
    RELATIVE = 1
    SATURATION = 2
    ABSOLUTE = 3


class _WhitePointKind(enum.Enum):
    D65 = 1
    CUSTOM = 2
    E = 10
    DCI = 11


class _PrimariesKind(enum.Enum):
    SRGB = 1
    CUSTOM = 2
    BT2100 = 9
    P3 = 11


class _TfKind(enum.Enum):
    BT709 = 1
    UNKNOWN = 2
    LINEAR = 8
    SRGB = 13
    PQ = 16
    DCI = 17
    HLG = 18


@dataclass(frozen=True)
class Customxy:
    """xy chromaticity scaled by 1e6."""

    x: int
    y: int

    @classmethod
    def parse(cls, bs: Bitstream) -> "Customxy":
        def read_one():
            u = bs.read_u32(U(19), 524288 + U(19), 1048576 + U(20), 2097152 + U(21))
            return unpack_signed(u)

        return cls(read_one(), read_one())

    def as_float(self) -> tuple[float, float]:
        return (self.x / 1e6, self.y / 1e6)


@dataclass(frozen=True)
class WhitePoint:
    kind: str  # 'd65' | 'custom' | 'e' | 'dci'
    custom: Customxy | None = None

    @classmethod
    def parse(cls, bs: Bitstream) -> "WhitePoint":
        k = bs.read_enum(_WhitePointKind)
        if k == _WhitePointKind.CUSTOM:
            return cls("custom", Customxy.parse(bs))
        return cls(k.name.lower())


WhitePoint.D65 = WhitePoint("d65")


@dataclass(frozen=True)
class Primaries:
    kind: str  # 'srgb' | 'custom' | 'bt2100' | 'p3'
    red: Customxy | None = None
    green: Customxy | None = None
    blue: Customxy | None = None

    @classmethod
    def parse(cls, bs: Bitstream) -> "Primaries":
        k = bs.read_enum(_PrimariesKind)
        if k == _PrimariesKind.CUSTOM:
            return cls(
                "custom",
                Customxy.parse(bs),
                Customxy.parse(bs),
                Customxy.parse(bs),
            )
        return cls(k.name.lower())

    def cicp(self) -> int | None:
        return {"srgb": 1, "bt2100": 9, "p3": 11}.get(self.kind)


Primaries.SRGB = Primaries("srgb")
Primaries.BT2100 = Primaries("bt2100")
Primaries.P3 = Primaries("p3")


@dataclass(frozen=True)
class TransferFunction:
    kind: str  # 'gamma' | 'bt709' | 'unknown' | 'linear' | 'srgb' | 'pq' | 'dci' | 'hlg'
    gamma: int = 0  # scaled by 1e7; meaningful iff kind == 'gamma'
    gamma_inverted: bool = False

    @classmethod
    def parse(cls, bs: Bitstream) -> "TransferFunction":
        if bs.read_bool():
            g = bs.read_bits(24)
            return cls("gamma", gamma=g, gamma_inverted=True)
        k = bs.read_enum(_TfKind)
        return cls(k.name.lower())

    def cicp(self) -> int | None:
        return {
            "bt709": 1,
            "linear": 8,
            "srgb": 13,
            "pq": 16,
            "dci": 17,
            "hlg": 18,
        }.get(self.kind)


TransferFunction.SRGB = TransferFunction("srgb")
TransferFunction.LINEAR = TransferFunction("linear")
TransferFunction.PQ = TransferFunction("pq")
TransferFunction.HLG = TransferFunction("hlg")


@dataclass
class ColourEncoding:
    """Either enum-described or 'use the embedded ICC profile'."""

    want_icc: bool = False
    colour_space: ColourSpace = ColourSpace.RGB
    white_point: WhitePoint = field(default_factory=lambda: WhitePoint.D65)
    primaries: Primaries = field(default_factory=lambda: Primaries.SRGB)
    tf: TransferFunction = field(default_factory=lambda: TransferFunction.SRGB)
    rendering_intent: RenderingIntent = RenderingIntent.RELATIVE

    @classmethod
    def parse(cls, bs: Bitstream) -> "ColourEncoding":
        if bs.read_bool():  # all_default -> sRGB
            return cls()
        want_icc = bs.read_bool()
        colour_space = bs.read_enum(ColourSpace)
        if want_icc:
            return cls(want_icc=True, colour_space=colour_space)
        if colour_space == ColourSpace.XYB:
            white_point = WhitePoint.D65
        else:
            white_point = WhitePoint.parse(bs)
        if colour_space in (ColourSpace.XYB, ColourSpace.GREY):
            primaries = Primaries.SRGB
        else:
            primaries = Primaries.parse(bs)
        tf = TransferFunction.parse(bs)
        rendering_intent = bs.read_enum(RenderingIntent)
        return cls(
            want_icc=False,
            colour_space=colour_space,
            white_point=white_point,
            primaries=primaries,
            tf=tf,
            rendering_intent=rendering_intent,
        )

    def is_srgb(self) -> bool:
        return (
            not self.want_icc
            and self.colour_space == ColourSpace.RGB
            and self.white_point.kind == "d65"
            and self.primaries.kind == "srgb"
            and self.tf.kind == "srgb"
        )

    def cicp(self) -> tuple[int, int, int, int] | None:
        if self.want_icc:
            return None
        p, t = self.primaries.cicp(), self.tf.cicp()
        if p is None or t is None:
            return None
        return (p, t, 0, 1)


@dataclass
class ToneMapping:
    intensity_target: float = 255.0
    min_nits: float = 0.0
    relative_to_max_display: bool = False
    linear_below: float = 0.0

    @classmethod
    def parse(cls, bs: Bitstream) -> "ToneMapping":
        if bs.read_bool():
            return cls()
        return cls(
            intensity_target=bs.read_f16_as_f32(),
            min_nits=bs.read_f16_as_f32(),
            relative_to_max_display=bs.read_bool(),
            linear_below=bs.read_f16_as_f32(),
        )


# Default opsin inverse matrix / biases (spec constants; jxl-image color.rs:613-627).
DEFAULT_INV_MAT = (
    (11.031566901960783, -9.866943921568629, -0.16462299647058826),
    (-3.254147380392157, 4.418770392156863, -0.16462299647058826),
    (-3.6588512862745097, 2.7129230470588235, 1.9459282392156863),
)
DEFAULT_OPSIN_BIAS = (-0.0037930732552754493,) * 3
DEFAULT_QUANT_BIAS = (
    1.0 - 0.05465007330715401,
    1.0 - 0.07005449891748593,
    1.0 - 0.049935103337343655,
)


@dataclass
class OpsinInverseMatrix:
    inv_mat: tuple = DEFAULT_INV_MAT
    opsin_bias: tuple = DEFAULT_OPSIN_BIAS
    quant_bias: tuple = DEFAULT_QUANT_BIAS
    quant_bias_numerator: float = 0.145

    @classmethod
    def parse(cls, bs: Bitstream) -> "OpsinInverseMatrix":
        if bs.read_bool():
            return cls()
        inv_mat = tuple(
            tuple(bs.read_f16_as_f32() for _ in range(3)) for _ in range(3)
        )
        opsin_bias = tuple(bs.read_f16_as_f32() for _ in range(3))
        quant_bias = tuple(bs.read_f16_as_f32() for _ in range(3))
        quant_bias_numerator = bs.read_f16_as_f32()
        return cls(inv_mat, opsin_bias, quant_bias, quant_bias_numerator)


# ---------------------------------------------------------------------------
# Extra channels


class ExtraChannelType(enum.Enum):
    ALPHA = 0
    DEPTH = 1
    SPOT_COLOUR = 2
    SELECTION_MASK = 3
    BLACK = 4
    CFA = 5
    THERMAL = 6
    NON_OPTIONAL = 15
    OPTIONAL = 16


@dataclass
class ExtraChannelInfo:
    ty: ExtraChannelType = ExtraChannelType.ALPHA
    bit_depth: BitDepth = field(default_factory=BitDepth)
    dim_shift: int = 0
    name: str = ""
    alpha_associated: bool = False
    spot_colour: tuple[float, float, float, float] | None = None
    cfa_channel: int = 0

    @classmethod
    def parse(cls, bs: Bitstream) -> "ExtraChannelInfo":
        if bs.read_bool():  # d_alpha: default alpha channel
            return cls()
        ty = bs.read_enum(ExtraChannelType)
        bit_depth = BitDepth.parse(bs)
        dim_shift = bs.read_u32(0, 3, 4, 1 + U(3))
        name = read_name(bs)
        info = cls(ty=ty, bit_depth=bit_depth, dim_shift=dim_shift, name=name)
        if ty == ExtraChannelType.ALPHA:
            info.alpha_associated = bs.read_bool()
        elif ty == ExtraChannelType.SPOT_COLOUR:
            info.spot_colour = tuple(bs.read_f16_as_f32() for _ in range(4))
        elif ty == ExtraChannelType.CFA:
            info.cfa_channel = bs.read_u32(1, U(2), 3 + U(4), 19 + U(8))
        return info

    @property
    def is_alpha(self) -> bool:
        return self.ty == ExtraChannelType.ALPHA

    @property
    def is_black(self) -> bool:
        return self.ty == ExtraChannelType.BLACK


# ---------------------------------------------------------------------------
# Metadata + full header


@dataclass
class ImageMetadata:
    orientation: int = 1
    intrinsic_size: SizeHeader | None = None
    preview: PreviewHeader | None = None
    animation: AnimationHeader | None = None
    bit_depth: BitDepth = field(default_factory=BitDepth)
    modular_16bit_buffers: bool = True
    ec_info: list[ExtraChannelInfo] = field(default_factory=list)
    xyb_encoded: bool = True
    colour_encoding: ColourEncoding = field(default_factory=ColourEncoding)
    tone_mapping: ToneMapping = field(default_factory=ToneMapping)
    opsin_inverse_matrix: OpsinInverseMatrix = field(default_factory=OpsinInverseMatrix)
    up2_weight: tuple | None = None  # None => spec default weights
    up4_weight: tuple | None = None
    up8_weight: tuple | None = None

    @classmethod
    def parse(cls, bs: Bitstream) -> "ImageMetadata":
        m = cls()
        all_default = bs.read_bool()
        extra_fields = False
        if not all_default:
            extra_fields = bs.read_bool()
            if extra_fields:
                m.orientation = 1 + bs.read_bits(3)
                if bs.read_bool():
                    m.intrinsic_size = SizeHeader.parse(bs)
                if bs.read_bool():
                    m.preview = PreviewHeader.parse(bs)
                if bs.read_bool():
                    m.animation = AnimationHeader.parse(bs)
            m.bit_depth = BitDepth.parse(bs)
            m.modular_16bit_buffers = bs.read_bool()
            num_extra = bs.read_u32(0, 1, 2 + U(4), 1 + U(12))
            m.ec_info = [ExtraChannelInfo.parse(bs) for _ in range(num_extra)]
            m.xyb_encoded = bs.read_bool()
            m.colour_encoding = ColourEncoding.parse(bs)
            if extra_fields:
                m.tone_mapping = ToneMapping.parse(bs)
            read_extensions(bs)
        default_m = bs.read_bool()
        if not default_m:
            if m.xyb_encoded:
                m.opsin_inverse_matrix = OpsinInverseMatrix.parse(bs)
            cw_mask = bs.read_bits(3)
            if cw_mask & 1:
                m.up2_weight = tuple(bs.read_f16_as_f32() for _ in range(15))
            if cw_mask & 2:
                m.up4_weight = tuple(bs.read_f16_as_f32() for _ in range(55))
            if cw_mask & 4:
                m.up8_weight = tuple(bs.read_f16_as_f32() for _ in range(210))
        return m

    @property
    def grayscale(self) -> bool:
        return self.colour_encoding.colour_space == ColourSpace.GREY

    def alpha_index(self) -> int | None:
        for i, info in enumerate(self.ec_info):
            if info.is_alpha:
                return i
        return None

    def apply_orientation(
        self, width: int, height: int, left: int, top: int, inverse: bool = False
    ) -> tuple[int, int, int, int]:
        o = self.orientation
        if o == 1:
            pass
        elif o == 2:
            left = width - left - 1
        elif o == 3:
            left, top = width - left - 1, height - top - 1
        elif o == 4:
            top = height - top - 1
        elif o == 5:
            left, top = top, left
        elif o == 6:
            left, top = (top, width - left - 1) if inverse else (height - top - 1, left)
        elif o == 7:
            left, top = height - top - 1, width - left - 1
        elif o == 8:
            left, top = (height - top - 1, left) if inverse else (top, width - left - 1)
        if o >= 5:
            width, height = height, width
        return width, height, left, top


@dataclass
class ImageHeader:
    size: SizeHeader
    metadata: ImageMetadata

    @classmethod
    def parse(cls, bs: Bitstream) -> "ImageHeader":
        signature = bs.read_bits(16)
        if signature != 0x0AFF:
            raise JxlValidationError("JPEG XL signature mismatch")
        size = SizeHeader.parse(bs)
        metadata = ImageMetadata.parse(bs)
        if len(metadata.ec_info) > 256:
            raise JxlValidationError("too many extra channels")
        tm = metadata.tone_mapping
        if tm.intensity_target <= 0.0:
            raise JxlValidationError("invalid intensity target")
        if tm.min_nits < 0.0 or tm.min_nits > tm.intensity_target:
            raise JxlValidationError("invalid min_nits")
        if tm.linear_below < 0.0 or (
            tm.relative_to_max_display and tm.linear_below > 1.0
        ):
            raise JxlValidationError("invalid linear_below")
        return cls(size=size, metadata=metadata)

    @property
    def width(self) -> int:
        return self.size.width

    @property
    def height(self) -> int:
        return self.size.height
