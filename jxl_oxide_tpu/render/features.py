"""Frame features: patches, splines, noise parameters.

Reference: jxl-frame/src/data/{patch.rs, spline.rs, noise.rs}.
Parsing is implemented in later build steps; stubs raise for now so the
decoder fails loudly rather than desyncing the bitstream.
"""

from __future__ import annotations

from ..io.bitstream import Bitstream
from ..utils.errors import JxlNotSupportedError

__all__ = ["NoiseParameters", "Patches", "Splines"]


class Patches:
    @classmethod
    def parse(cls, bs: Bitstream, image_header, frame_header):
        raise JxlNotSupportedError("patches not implemented yet")


class Splines:
    @classmethod
    def parse(cls, bs: Bitstream, frame_header):
        raise JxlNotSupportedError("splines not implemented yet")


class NoiseParameters:
    lut: tuple

    @classmethod
    def parse(cls, bs: Bitstream) -> "NoiseParameters":
        # 8-point LUT of f16 values (noise.rs)
        p = cls()
        p.lut = tuple(bs.read_bits(10) / (1 << 10) for _ in range(8))
        return p
