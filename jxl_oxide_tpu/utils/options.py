"""Decoder option plumbing (contextvar-scoped, like the alloc tracker).

force_wide_buffers: disable the narrow (i16) modular sample lane even when
modular_16bit_buffers is set in the image header (JxlImageBuilder
force_wide_buffers, jxl-oxide/src/lib.rs:199-234; sample lanes
jxl-modular/src/sample.rs:4-36).
"""

from __future__ import annotations

import contextlib
import contextvars
import os

_force_wide: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "jxl_force_wide_buffers", default=False
)


def local_accelerator() -> bool:
    """True when jax dispatch lands on a locally-attached accelerator
    (platform "tpu": microsecond dispatch). The tunneled dev platform
    ("axon", ~25 ms per dispatch RPC) and the CPU backend return False —
    on those, host C++ wins any per-plane device round trip."""
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - jax import failure
        return False


def device_modular_may_engage() -> bool:
    """Whether the device (XLA) modular inverse-transform tail may run
    for this process. JXL_TPU_DEVICE_MODULAR overrides ("1" forces on,
    "0" forces off); unset selects automatically: on iff a local
    accelerator backs dispatch (ops/modular_tail.py; the per-image
    worthwhileness check on plane width lives in ModularImage.finish)."""
    mode = os.environ.get("JXL_TPU_DEVICE_MODULAR")
    if mode is not None and mode != "":
        return mode != "0"
    return local_accelerator()


def device_modular_forced() -> bool:
    """True only under the explicit JXL_TPU_DEVICE_MODULAR=1 override
    (tests use it to pin the device path regardless of plane size)."""
    mode = os.environ.get("JXL_TPU_DEVICE_MODULAR")
    return bool(mode) and mode != "0"


def get_force_wide() -> bool:
    return _force_wide.get()


@contextlib.contextmanager
def use_force_wide(value: bool):
    token = _force_wide.set(value)
    try:
        yield
    finally:
        _force_wide.reset(token)
