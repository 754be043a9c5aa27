"""Bitstream primitive tests (parity contracts from jxl-bitstream docs/tests)."""

import pytest

from jxl_oxide_tpu.io.bitstream import Bitstream, U, unpack_signed
from jxl_oxide_tpu.utils.errors import JxlBitstreamError, JxlEofError


def test_read_bits_lsb_first():
    bs = Bitstream(bytes([0b10110010, 0xFF]))
    assert bs.read_bits(1) == 0
    assert bs.read_bits(2) == 0b01
    assert bs.read_bits(5) == 0b10110
    assert bs.read_bits(8) == 0xFF


def test_read_bits_across_bytes():
    bs = Bitstream(bytes([0xAB, 0xCD, 0xEF]))
    assert bs.read_bits(24) == 0xEFCDAB


def test_read_u32_doc_example():
    # Reference doctest (bitstream.rs:212-220): buf=[0b110010],
    # distributions (1, U(2), 3+U(4), 19+U(8)) -> 15.
    bs = Bitstream(bytes([0b110010]))
    assert bs.read_u32(1, U(2), 3 + U(4), 19 + U(8)) == 15


def test_read_u64_selectors():
    # selector 0 -> 0
    assert Bitstream(bytes([0b00])).read_u64() == 0
    # selector 1 -> 4 bits + 1: bits 01 then value 0b1111 -> 16
    bs = Bitstream(bytes([0b111101, 0b11]))
    assert bs.read_u64() == 16
    # selector 2 -> 8 bits + 17
    bs = Bitstream(bytes([0b10, 0x00, 0b100]))
    bs2 = Bitstream(int.to_bytes((0xFF << 2) | 0b10, 2, "little"))
    assert bs2.read_u64() == 0xFF + 17


def test_read_u64_long():
    # selector 3, 12-bit value, then stop bit 0
    val = 0xABC
    raw = 0b11 | (val << 2) | (0 << 14)
    bs = Bitstream(int.to_bytes(raw, 2, "little"))
    assert bs.read_u64() == 0xABC


def test_f16():
    # 1.0 in f16 = 0x3C00
    bs = Bitstream(int.to_bytes(0x3C00, 2, "little"))
    assert bs.read_f16_as_f32() == 1.0
    # -2.0 = 0xC000
    bs = Bitstream(int.to_bytes(0xC000, 2, "little"))
    assert bs.read_f16_as_f32() == -2.0
    # NaN rejected
    bs = Bitstream(int.to_bytes(0x7E00, 2, "little"))
    with pytest.raises(JxlBitstreamError):
        bs.read_f16_as_f32()
    # subnormal: smallest = 1/16384/1024
    bs = Bitstream(int.to_bytes(0x0001, 2, "little"))
    assert bs.read_f16_as_f32() == pytest.approx(5.960464477539063e-08)


def test_zero_pad():
    bs = Bitstream(bytes([0b00000001, 0xFF]))
    bs.read_bits(1)
    bs.zero_pad_to_byte()
    assert bs.pos == 8
    bs = Bitstream(bytes([0b00000011]))
    bs.read_bits(1)
    with pytest.raises(JxlBitstreamError):
        bs.zero_pad_to_byte()


def test_eof():
    bs = Bitstream(b"\x01")
    with pytest.raises(JxlEofError):
        bs.read_bits(9)


def test_unpack_signed():
    assert [unpack_signed(i) for i in range(6)] == [0, -1, 1, -2, 2, -3]


def test_peek_zero_extends_past_eof():
    bs = Bitstream(b"\xff")
    assert bs.peek_bits(16) == 0x00FF


def test_read_extensions_skips_payloads():
    """Extension payload skipping (jxl-image lib.rs:214-236): bitmask ->
    one u64 length per set bit -> payloads skipped in order; the reader
    must land exactly on the trailing data."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import BitWriter

    from jxl_oxide_tpu.headers.image import read_extensions

    w = BitWriter()
    # u64 selector 1 -> 4-bit (value - 1): bitmask 0b101 (ext 0 and 2)
    w.write(1, 2)
    w.write(0b101 - 1, 4)
    for ln in (5, 9):  # payload lengths in bits
        w.write(1, 2)
        w.write(ln - 1, 4)
    w.write(0b10101, 5)   # payload 0
    w.write(0x1AB & 0x1FF, 9)  # payload 2
    w.write(0x5A, 8)      # sentinel after the extensions block
    bs = Bitstream(w.to_bytes())
    mask = read_extensions(bs)
    assert mask == 0b101
    assert bs.read_bits(8) == 0x5A
