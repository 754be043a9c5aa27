"""LSB-first bitstream reader and JPEG XL spec primitives.

Behavioral parity with the reference bit reader
(jxl-bitstream/src/bitstream.rs:9-343): little-endian byte order, LSB-first
bit order, `U32` 2-bit-selector distributions, `U64` variable-length ints,
`F16` with NaN/Inf rejection, `Enum`, `ZeroPadToByte`, and zigzag
`UnpackSigned` (jxl-bitstream/src/lib.rs:24-38).

This is the host-side byte-granular stage; it never touches the device. The
pure-Python implementation favors simplicity; the C++ host runtime (see
`jxl_oxide_tpu/native`) supersedes it on hot entropy paths.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..utils.errors import JxlBitstreamError, JxlEofError

__all__ = [
    "Bitstream",
    "U",
    "U32Spec",
    "unpack_signed",
]


@dataclass(frozen=True)
class U:
    """`u(n)`: read n raw bits (optionally with additive offset)."""

    bits: int
    offset: int = 0

    def __radd__(self, offset: int) -> "U":
        return U(self.bits, self.offset + offset)


# A U32 distribution entry is either a constant int or a U(bits, offset).
U32Spec = int | U


class Bitstream:
    """Bit reader over an immutable bytes-like buffer.

    Unlike the reference's 64-bit sliding buffer, we track an absolute bit
    position; Python-int shifts on small windows keep this simple and exactly
    equivalent (each byte's bits are consumed LSB first).
    """

    __slots__ = ("data", "pos", "_len_bits")

    def __init__(self, data: bytes | bytearray | memoryview, pos: int = 0):
        self.data = bytes(data)
        self.pos = pos
        self._len_bits = len(self.data) * 8

    # -- core ------------------------------------------------------------

    def remaining_bits(self) -> int:
        return self._len_bits - self.pos

    def num_read_bits(self) -> int:
        return self.pos

    def read_bits(self, n: int) -> int:
        """Read n (<= 57 typical, any n supported) bits, LSB-first."""
        pos = self.pos
        end = pos + n
        if end > self._len_bits:
            raise JxlEofError(f"need {n} bits at {pos}, have {self._len_bits - pos}")
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        window = int.from_bytes(self.data[first_byte:last_byte], "little")
        self.pos = end
        return (window >> (pos & 7)) & ((1 << n) - 1)

    def peek_bits(self, n: int) -> int:
        """Peek up to n bits without consuming; short reads past EOF return
        zero-extended bits (matches the reference's refill-with-zeros tail
        behavior used by entropy decoders near stream end)."""
        pos = self.pos
        avail = self._len_bits - pos
        first_byte = pos >> 3
        end = pos + n
        last_byte = (end + 7) >> 3
        window = int.from_bytes(self.data[first_byte:last_byte], "little")
        out = (window >> (pos & 7)) & ((1 << n) - 1)
        if avail < 0:
            raise JxlEofError("peek past end")
        return out

    def consume_bits(self, n: int) -> None:
        if self.pos + n > self._len_bits:
            raise JxlEofError("consume past end")
        self.pos += n

    def skip_bits(self, n: int) -> None:
        self.consume_bits(n)

    def read_bool(self) -> bool:
        return self.read_bits(1) != 0

    def zero_pad_to_byte(self) -> None:
        n = (-self.pos) % 8
        if n and self.read_bits(n) != 0:
            raise JxlBitstreamError("non-zero padding bits")

    # -- spec primitives ---------------------------------------------------

    def read_u32(self, d0: U32Spec, d1: U32Spec, d2: U32Spec, d3: U32Spec) -> int:
        d = (d0, d1, d2, d3)[self.read_bits(2)]
        if isinstance(d, int):
            return d
        return (self.read_bits(d.bits) + d.offset) & 0xFFFFFFFF

    def read_u64(self) -> int:
        sel = self.read_bits(2)
        if sel == 0:
            return 0
        if sel == 1:
            return self.read_bits(4) + 1
        if sel == 2:
            return self.read_bits(8) + 17
        value = self.read_bits(12)
        shift = 12
        while self.read_bits(1) == 1:
            if shift == 60:
                value |= self.read_bits(4) << shift
                break
            value |= self.read_bits(8) << shift
            shift += 8
        return value

    def read_f16_as_f32(self) -> float:
        import struct

        v = self.read_bits(16)
        sign = -1.0 if (v & 0x8000) else 1.0
        if v & 0x7FFF == 0:
            return sign * 0.0
        mantissa = v & 0x3FF
        exponent = (v >> 10) & 0x1F
        if exponent == 0x1F:
            raise JxlBitstreamError("F16 NaN/Inf not allowed")
        if exponent == 0:
            return sign * (1.0 / 16384.0) * (mantissa / 1024.0)
        bits = (mantissa << 13) | ((exponent + 112) << 23)
        out = struct.unpack("<f", struct.pack("<I", bits))[0]
        return sign * out

    def read_enum(self, enum_cls):
        v = self.read_u32(0, 1, 2 + U(4), 18 + U(6))
        try:
            return enum_cls(v)
        except ValueError:
            raise JxlBitstreamError(f"invalid {enum_cls.__name__} value {v}") from None


def unpack_signed(u: int) -> int:
    """Zigzag de-mapping: 0,1,2,3,... -> 0,-1,1,-2,... per spec UnpackSigned.

    Reference contract: jxl-bitstream/src/lib.rs:24-29 (u32 wrapping arith).
    """
    if u & 1:
        return -((u + 1) >> 1)
    return u >> 1
