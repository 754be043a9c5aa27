"""Error types for the TPU-native JPEG XL engine.

Mirrors the error taxonomy of the reference decoder (jxl-bitstream/src/error.rs,
jxl-frame, jxl-render) without copying its structure: a small exception tree is
enough on the Python host side; device code never raises.
"""

from __future__ import annotations


class JxlError(Exception):
    """Base class for all decode errors."""


class JxlEofError(JxlError):
    """Ran out of bits/bytes mid-parse.

    Carries progressive-decode semantics: callers that decode streaming input
    catch this and retry once more bytes arrive (reference: `allow_partial`
    plumbing, jxl-frame/src/lib.rs:332).
    """


class JxlBitstreamError(JxlError):
    """Spec violation in the bitstream (bad padding, invalid enum, ...)."""


class JxlValidationError(JxlError):
    """Header or size validation failure (limits from ISO/IEC 18181-1)."""


class JxlOutOfMemoryError(JxlError):
    """Allocation budget exceeded (analog of jxl-grid AllocTracker)."""


class JxlNotSupportedError(JxlError):
    """Feature recognized but not implemented yet."""
