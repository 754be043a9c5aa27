"""Minimal PNG writer (8/16-bit, gray/RGB/+alpha, optional ICC/APNG).

Mirrors the output capabilities of jxl-oxide-cli/src/output.rs using only
stdlib zlib/struct. APNG frames use fcTL/fdAT chunks for animations.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["write_png", "write_apng"]

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _scanlines(img) -> bytes:
    import numpy as np

    h = img.shape[0]
    big = img.astype(">u2") if img.dtype.itemsize == 2 else img.astype("u1")
    rows = big.reshape(h, -1).view("u1" if img.dtype.itemsize == 1 else "u1")
    raw = bytearray()
    flat = big.tobytes()
    stride = len(flat) // h
    for y in range(h):
        raw.append(0)  # filter: None
        raw += flat[y * stride : (y + 1) * stride]
    return bytes(raw)


def _header_chunks(width, height, bit_depth, channels, icc=None) -> bytes:
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(
        b"IHDR",
        struct.pack(
            ">IIBBBBB", width, height, bit_depth, _COLOR_TYPE[channels], 0, 0, 0
        ),
    )
    if icc:
        payload = b"icc\x00\x00" + zlib.compress(icc)
        out += _chunk(b"iCCP", payload)
    return out


def write_png(path, img, icc: bytes | None = None) -> None:
    """img: [H, W] or [H, W, C] uint8/uint16 array."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    bit_depth = img.dtype.itemsize * 8
    out = _header_chunks(w, h, bit_depth, c, icc)
    out += _chunk(b"IDAT", zlib.compress(_scanlines(img), 6))
    out += _chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


def write_apng(path, frames, durations_ms, num_loops=0, icc=None) -> None:
    """frames: list of [H, W, C] arrays with equal shape/dtype."""
    import numpy as np

    imgs = [np.asarray(f) for f in frames]
    if imgs[0].ndim == 2:
        imgs = [f[:, :, None] for f in imgs]
    h, w, c = imgs[0].shape
    bit_depth = imgs[0].dtype.itemsize * 8
    out = _header_chunks(w, h, bit_depth, c, icc)
    out += _chunk(b"acTL", struct.pack(">II", len(imgs), num_loops))
    seq = 0
    for i, (img, dur) in enumerate(zip(imgs, durations_ms)):
        out += _chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, w, h, 0, 0, int(dur), 1000, 0, 0
            ),
        )
        seq += 1
        data = zlib.compress(_scanlines(img), 6)
        if i == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)
