"""Brotli decompression via the system libbrotlidec (ctypes).

Replaces the reference's brotli-decompressor crate dependency
(jxl-jbr/src/lib.rs:28-31) for jbrd data streams and brob boxes.
"""

from __future__ import annotations

import ctypes
import ctypes.util

from .errors import JxlError

__all__ = ["brotli_decompress"]

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1"
        _lib = ctypes.CDLL(name)
        _lib.BrotliDecoderDecompress.restype = ctypes.c_int
    return _lib


def brotli_decompress(data: bytes, expected_size: int | None = None,
                      max_size: int = 1 << 28) -> bytes:
    """One-shot decompression with growing output buffer."""
    lib = _get_lib()
    size = expected_size if expected_size else max(4 * len(data), 1 << 16)
    while size <= max_size:
        out = ctypes.create_string_buffer(size)
        out_len = ctypes.c_size_t(size)
        ret = lib.BrotliDecoderDecompress(
            ctypes.c_size_t(len(data)),
            ctypes.c_char_p(data),
            ctypes.byref(out_len),
            out,
        )
        if ret == 1:  # BROTLI_DECODER_RESULT_SUCCESS
            return out.raw[: out_len.value]
        if expected_size:
            break
        size *= 4
    raise JxlError("brotli decompression failed")
