"""ICC profile stream decoding (JPEG XL ICC compression).

Behavioral parity with jxl-color/src/icc/decode.rs: a 41-context entropy-coded
byte stream is decoded first, then reconstructed into the ICC binary by a
varint-framed command stream with header prediction, common tag/data
dictionaries, shuffles and delta-prediction.

Host-side; also serves as the primary real-data validation of the ANS core.
"""

from __future__ import annotations

from ..coding.entropy import Decoder
from ..io.bitstream import Bitstream
from ..utils.errors import JxlBitstreamError, JxlValidationError

__all__ = ["read_icc", "decode_icc"]

_COMMON_TAGS = (
    b"rTRC", b"rXYZ", b"cprt", b"wtpt", b"bkpt", b"rXYZ", b"gXYZ", b"bXYZ",
    b"kXYZ", b"rTRC", b"gTRC", b"bTRC", b"kTRC", b"chad", b"desc", b"chrm",
    b"dmnd", b"dmdd", b"lumi",
)

_COMMON_DATA = (b"XYZ ", b"desc", b"text", b"mluc", b"para", b"curv", b"sf32", b"gbd ")


def _icc_context(idx: int, b1: int, b2: int) -> int:
    if idx <= 128:
        return 0
    if (0x41 <= b1 <= 0x5A) or (0x61 <= b1 <= 0x7A):
        p1 = 0
    elif (0x30 <= b1 <= 0x39) or b1 in (0x2E, 0x2C):
        p1 = 1
    elif b1 <= 1:
        p1 = 2 + b1
    elif b1 <= 15:
        p1 = 4
    elif 241 <= b1 <= 254:
        p1 = 5
    elif b1 == 255:
        p1 = 6
    else:
        p1 = 7
    if (0x41 <= b2 <= 0x5A) or (0x61 <= b2 <= 0x7A):
        p2 = 0
    elif (0x30 <= b2 <= 0x39) or b2 in (0x2E, 0x2C):
        p2 = 1
    elif b2 <= 15:
        p2 = 2
    elif b2 >= 241:
        p2 = 3
    else:
        p2 = 4
    return 1 + p1 + 8 * p2


class _ByteReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def varint(self) -> int:
        value = 0
        shift = 0
        while shift < 63:
            if self.pos >= len(self.data):
                raise JxlBitstreamError("ICC stream too short (varint)")
            b = self.data[self.pos]
            self.pos += 1
            value |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return value

    def byte(self) -> int | None:
        if self.pos >= len(self.data):
            return None
        b = self.data[self.pos]
        self.pos += 1
        return b



def _validate_icc_stream(data: bytes, enc_size: int) -> None:
    """Sanity checks on the decoded stream header varints (decode.rs)."""
    r = _ByteReader(data[:18])
    output_size = r.varint()
    commands_size = r.varint()
    if r.pos + commands_size > enc_size:
        raise JxlBitstreamError("invalid ICC commands_size")
    if output_size > (1 << 28):
        raise JxlValidationError("ICC output_size too large")
    if output_size + 65536 < enc_size:
        raise JxlBitstreamError("ICC output_size far smaller than enc_size")


def read_icc(bs: Bitstream) -> bytes:
    """Read the entropy-coded ICC stream (still compressed) from the bitstream."""
    enc_size = bs.read_u64()
    if enc_size > (1 << 28):
        raise JxlValidationError("encoded ICC profile too large")
    decoder = Decoder(bs, 41)

    from .. import native as _native

    if _native.available():
        data = _native.decode_icc_native(bs, decoder, enc_size)
        _validate_icc_stream(data, enc_size)
        return data

    decoder.begin(bs)

    out = bytearray()
    b1 = b2 = 0

    def read_byte(idx: int) -> int:
        nonlocal b1, b2
        sym = decoder.read_varint(bs, _icc_context(idx, b1, b2))
        if sym >= 256:
            raise JxlBitstreamError("ICC byte out of range")
        b2 = b1
        b1 = sym
        return sym

    header_len = min(enc_size, 18)
    for idx in range(header_len):
        out.append(read_byte(idx))

    # Sanity checks on (output_size, commands_size) varints.
    r = _ByteReader(bytes(out))
    output_size = r.varint()
    commands_size = r.varint()
    if r.pos + commands_size > enc_size:
        raise JxlBitstreamError("invalid ICC commands_size")
    if output_size > (1 << 28):
        raise JxlValidationError("ICC output_size too large")
    if output_size + 65536 < enc_size:
        raise JxlBitstreamError("ICC output_size far smaller than enc_size")

    for idx in range(header_len, enc_size):
        out.append(read_byte(idx))
    decoder.finalize()
    return bytes(out)


def _predict_header(idx: int, output_size: int, header: bytes) -> int:
    if idx <= 3:
        return (output_size >> (8 * (3 - idx))) & 0xFF
    if idx == 8:
        return 4
    if 12 <= idx <= 23:
        return b"mntrRGB XYZ "[idx - 12]
    if 36 <= idx <= 39:
        return b"acsp"[idx - 36]
    h40 = header[40] if len(header) > 40 else 0
    h41 = header[41] if len(header) > 41 else 0
    if h40 == ord("A"):
        if idx in (41, 42):
            return ord("P")
        if idx == 43:
            return ord("L")
    if h40 == ord("M"):
        if idx == 41:
            return ord("S")
        if idx == 42:
            return ord("F")
        if idx == 43:
            return ord("T")
    if h40 == ord("S") and h41 == ord("G"):
        if idx == 42:
            return ord("I")
        if idx == 43:
            return ord(" ")
    if h40 == ord("S") and h41 == ord("U"):
        if idx == 42:
            return ord("N")
        if idx == 43:
            return ord("W")
    if idx == 70:
        return 246
    if idx == 71:
        return 214
    if idx == 73:
        return 1
    if idx == 78:
        return 211
    if idx == 79:
        return 45
    if 80 <= idx <= 83:
        return header[4 + idx - 80] if len(header) > 4 + idx - 80 else 0
    return 0


def _shuffle2(b: bytes) -> bytes:
    n = len(b)
    h = n // 2
    odd = n % 2
    out = bytearray()
    for i in range(h):
        out.append(b[i])
        out.append(b[i + h + odd])
    if odd:
        out.append(b[h])
    return bytes(out)


def _shuffle4(b: bytes) -> bytes:
    n = len(b)
    step = n // 4
    wide = n % 4
    out = bytearray()
    for i in range(step):
        base = i
        for _ in range(wide):
            out.append(b[base])
            base += step + 1
        for _ in range(wide, 4):
            out.append(b[base])
            base += step
    for i in range(1, wide + 1):
        out.append(b[(step + 1) * i - 1])
    return bytes(out)


def decode_icc(stream: bytes) -> bytes:
    """Reconstruct the ICC binary from the decompressed command/data stream."""
    r = _ByteReader(stream)
    output_size = r.varint()
    commands_size = r.varint()
    if r.pos + commands_size > len(stream):
        raise JxlBitstreamError("invalid ICC commands_size")
    if output_size > (1 << 28):
        raise JxlValidationError("ICC output_size too large")

    commands = _ByteReader(stream[r.pos : r.pos + commands_size])
    data = stream[r.pos + commands_size :]
    dpos = 0
    header_size = min(output_size, 128)
    if len(data) < header_size:
        raise JxlBitstreamError("invalid ICC output_size")
    header_data = data[:header_size]
    dpos = header_size

    out = bytearray()
    for idx in range(header_size):
        p = _predict_header(idx, output_size & 0xFFFFFFFF, header_data)
        out.append((p + header_data[idx]) & 0xFF)
    if output_size <= 128:
        return bytes(out)

    # Tag list
    v = commands.varint()
    if v >= 1:
        num_tags = v - 1
        if (output_size - 128) // 12 < num_tags:
            raise JxlBitstreamError("ICC num_tags too large")
        out += num_tags.to_bytes(4, "big")
        prev_tagstart = num_tags * 12 + 128
        prev_tagsize = 0
        while True:
            command = commands.byte()
            if command is None:
                return bytes(out)
            tagcode = command & 63
            if tagcode == 0:
                break
            if tagcode == 1:
                if len(data) - dpos < 4:
                    raise JxlBitstreamError("ICC data stream too short")
                tag = data[dpos : dpos + 4]
                dpos += 4
            elif 2 <= tagcode <= 20:
                tag = _COMMON_TAGS[tagcode - 2]
            else:
                raise JxlBitstreamError("invalid ICC tagcode")
            if command & 64:
                tagstart = commands.varint() & 0xFFFFFFFF
            else:
                tagstart = (prev_tagstart + prev_tagsize) & 0xFFFFFFFF
            if command & 128:
                tagsize = commands.varint() & 0xFFFFFFFF
            elif tag in (b"rXYZ", b"gXYZ", b"bXYZ", b"kXYZ", b"wtpt", b"bkpt", b"lumi"):
                tagsize = 20
            else:
                tagsize = prev_tagsize
            if tagstart + tagsize > output_size:
                raise JxlBitstreamError("ICC profile size mismatch")
            prev_tagstart = tagstart
            prev_tagsize = tagsize
            out += tag
            out += tagstart.to_bytes(4, "big")
            out += tagsize.to_bytes(4, "big")
            if tagcode == 2:
                for extra in (b"gTRC", b"bTRC"):
                    out += extra
                    out += tagstart.to_bytes(4, "big")
                    out += tagsize.to_bytes(4, "big")
            elif tagcode == 3:
                for k, extra in enumerate((b"gXYZ", b"bXYZ"), start=1):
                    out += extra
                    out += ((tagstart + tagsize * k) & 0xFFFFFFFF).to_bytes(4, "big")
                    out += tagsize.to_bytes(4, "big")

    # Main data stream
    while True:
        command = commands.byte()
        if command is None:
            break
        if command == 1:
            num = commands.varint()
            if num > len(data) - dpos:
                raise JxlBitstreamError("ICC data stream too short")
            out += data[dpos : dpos + num]
            dpos += num
        elif command in (2, 3):
            num = commands.varint()
            if num > len(data) - dpos:
                raise JxlBitstreamError("ICC data stream too short")
            chunk = data[dpos : dpos + num]
            dpos += num
            out += _shuffle2(chunk) if command == 2 else _shuffle4(chunk)
        elif command == 4:
            flags = commands.byte()
            if flags is None:
                raise JxlBitstreamError("ICC command stream too short")
            width = (flags & 3) + 1
            order = (flags >> 2) & 3
            if width == 3 or order == 3:
                raise JxlBitstreamError("invalid ICC prediction params")
            if flags & 16:
                stride = commands.varint()
                if stride < width:
                    raise JxlBitstreamError("ICC stride < width")
            else:
                stride = width
            if stride * 4 >= len(out):
                raise JxlBitstreamError("ICC stride too large")
            num = commands.varint()
            if num > len(data) - dpos:
                raise JxlBitstreamError("ICC data stream too short")
            chunk = data[dpos : dpos + num]
            dpos += num
            if width == 2:
                chunk = _shuffle2(chunk)
            elif width == 4:
                chunk = _shuffle4(chunk)
            mask32 = 0xFFFFFFFF
            for i in range(0, num, width):
                prev = [0, 0, 0]
                for j in range(order + 1):
                    offset = len(out) - stride * (j + 1)
                    word = bytes(out[offset : offset + width])
                    prev[j] = int.from_bytes(word, "big")
                if order == 0:
                    p = prev[0]
                elif order == 1:
                    p = (2 * prev[0] - prev[1]) & mask32
                else:
                    p = (3 * (prev[0] - prev[1]) + prev[2]) & mask32
                for j in range(min(width, num - i)):
                    val = (chunk[i + j] + (p >> (8 * (width - 1 - j)))) & 0xFF
                    out.append(val)
        elif command == 10:
            if len(data) - dpos < 12:
                raise JxlBitstreamError("ICC data stream too short")
            out += b"XYZ \x00\x00\x00\x00"
            out += data[dpos : dpos + 12]
            dpos += 12
        elif 16 <= command <= 23:
            out += _COMMON_DATA[command - 16]
            out += b"\x00\x00\x00\x00"
        else:
            raise JxlBitstreamError(f"invalid ICC command {command}")
    if len(out) != output_size:
        raise JxlBitstreamError("decoded ICC size mismatch")
    return bytes(out)
