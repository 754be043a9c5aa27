"""Decoder option plumbing (contextvar-scoped, like the alloc tracker).

force_wide_buffers: disable the narrow (i16) modular sample lane even when
modular_16bit_buffers is set in the image header (JxlImageBuilder
force_wide_buffers, jxl-oxide/src/lib.rs:199-234; sample lanes
jxl-modular/src/sample.rs:4-36).
"""

from __future__ import annotations

import contextlib
import contextvars

_force_wide: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "jxl_force_wide_buffers", default=False
)


def get_force_wide() -> bool:
    return _force_wide.get()


@contextlib.contextmanager
def use_force_wide(value: bool):
    token = _force_wide.set(value)
    try:
        yield
    finally:
        _force_wide.reset(token)
