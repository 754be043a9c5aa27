"""Restoration filters on device: gaborish and edge-preserving filter.

Behavioral parity: jxl-render/src/filter/{gabor.rs,epf.rs} and
filter/impls/generic/{gabor.rs,epf.rs}. The reference runs hand-written
per-row SIMD kernels; here each pass is one whole-plane jitted op built
from shifted views of a mirror-padded tensor (VPU elementwise work, fused
by XLA). Boundary semantics:
  - gaborish: clamp-to-edge (generic/gabor.rs edge handling)
  - EPF: symmetric mirror (util.rs:376-386 `mirror`)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gabor", "epf_step", "sigma_map_from_blocks"]


@functools.partial(jax.jit, static_argnames=("weights", "prepad_rows",
                                              "prepad_cols"))
def gabor(plane, weights: tuple, prepad_rows: int = 0, prepad_cols: int = 0):
    """3x3 self-correlation smoothing (gabor.rs:8-121), one channel.

    weights = (w0, w1): side and diagonal weights; kernel is
    [[w1 w0 w1], [w0 1 w0], [w1 w0 w1]] / (1 + 4*w0 + 4*w1),
    clamp-to-edge boundary.

    prepad_rows=1 (or prepad_cols=1): `plane` already carries one extra
    row (column) on each side — real halo data from a neighboring shard;
    only the other dimension is padded here. Output drops the halo.
    Used by the sharded pipeline.
    """
    w0, w1 = weights
    if prepad_rows:
        assert prepad_rows == 1 and not prepad_cols
        p = jnp.pad(plane, ((0, 0), (1, 1)), mode="edge")
    elif prepad_cols:
        assert prepad_cols == 1
        p = jnp.pad(plane, ((1, 1), (0, 0)), mode="edge")
    else:
        p = jnp.pad(plane, 1, mode="edge")
    c = p[1:-1, 1:-1]
    n = p[:-2, 1:-1]
    s = p[2:, 1:-1]
    w = p[1:-1, :-2]
    e = p[1:-1, 2:]
    nw = p[:-2, :-2]
    ne = p[:-2, 2:]
    sw = p[2:, :-2]
    se = p[2:, 2:]
    total = c + (n + s + w + e) * w0 + (nw + ne + sw + se) * w1
    return total * (1.0 / (1.0 + 4.0 * w0 + 4.0 * w1))


_EPF_KERNEL = {
    0: ((0, -2), (-1, -1), (0, -1), (1, -1), (-2, 0), (-1, 0), (1, 0),
        (2, 0), (-1, 1), (0, 1), (1, 1), (0, 2)),
    1: ((0, -1), (0, 1), (-1, 0), (1, 0)),
    2: ((0, -1), (0, 1), (-1, 0), (1, 0)),
}
_EPF_DIST = {
    0: ((0, -1), (1, 0), (0, 0), (-1, 0), (0, 1)),
    1: ((0, -1), (0, 0), (0, 1), (-1, 0), (1, 0)),
    2: ((0, 0),),
}
PAD = 3


def _shift(padded, dx, dy, h, w):
    """View of the PAD-padded plane shifted by (dx, dy)."""
    return padded[PAD + dy : PAD + dy + h, PAD + dx : PAD + dx + w]


@functools.partial(jax.jit, static_argnames=("step", "channel_scale",
                                             "step_multiplier",
                                             "border_sad_mul",
                                             "prepad_rows", "prepad_cols"))
def epf_step(planes, sigma, step: int, channel_scale: tuple,
             step_multiplier: float, border_sad_mul: float,
             prepad_rows: int = 0, prepad_cols: int = 0):
    """One EPF pass over the 3 color planes (impls/generic/epf.rs).

    planes: [3, H, W]; sigma: [H, W] per-pixel sigma (expanded from the
    per-8x8-block grid). Returns filtered [3, H, W].

    prepad_rows=PAD (or prepad_cols=PAD): `planes` is [3, H+2*PAD, W]
    ([3, H, W+2*PAD]) with real halo rows (columns) from neighboring
    shards already attached; only the other dimension is padded here.
    sigma stays [H, W]. Output is [3, H, W]. Used by the sharded pipeline.
    """
    if prepad_rows:
        assert prepad_rows == PAD and not prepad_cols
        h = planes.shape[1] - 2 * PAD
        w = planes.shape[2]
        padded = jnp.pad(planes, ((0, 0), (0, 0), (PAD, PAD)),
                         mode="symmetric")
        planes = planes[:, PAD:-PAD, :]
    elif prepad_cols:
        assert prepad_cols == PAD
        h = planes.shape[1]
        w = planes.shape[2] - 2 * PAD
        padded = jnp.pad(planes, ((0, 0), (PAD, PAD), (0, 0)),
                         mode="symmetric")
        planes = planes[:, :, PAD:-PAD]
    else:
        _, h, w = planes.shape
        padded = jnp.pad(planes, ((0, 0), (PAD, PAD), (PAD, PAD)),
                         mode="symmetric")

    # step multiplier pattern: border rows (y%8 in {0,7}) scale everything;
    # otherwise border columns (x%8 in {0,7}) scale (epf.rs:29-43).
    yy = jnp.arange(h)[:, None] % 8
    xx = jnp.arange(w)[None, :] % 8
    y_border = (yy == 0) | (yy == 7)
    x_border = (xx == 0) | (xx == 7)
    sm = jnp.where(y_border | x_border, step_multiplier * border_sad_mul,
                   step_multiplier)

    neg_inv_sigma = (6.6 * (np.float32(1.0 / np.sqrt(2.0)) - 1.0)
                     / sigma) * sm

    center = planes
    sum_weights = jnp.ones((h, w), dtype=jnp.float32)
    sum_channels = center.astype(jnp.float32)

    cs = jnp.asarray(channel_scale, dtype=jnp.float32)
    for kx, ky in _EPF_KERNEL[step]:
        dist = jnp.zeros((h, w), dtype=jnp.float32)
        for c in range(3):
            acc = jnp.zeros((h, w), dtype=jnp.float32)
            pc = padded[c]
            for ix, iy in _EPF_DIST[step]:
                a = _shift(pc, kx + ix, ky + iy, h, w)
                b = _shift(pc, ix, iy, h, w)
                acc = acc + jnp.abs(a - b)
            dist = dist + cs[c] * acc
        weight = jnp.maximum(1.0 + dist * neg_inv_sigma, 0.0)
        sum_weights = sum_weights + weight
        for c in range(3):
            sum_channels = sum_channels.at[c].add(
                weight * _shift(padded[c], kx, ky, h, w)
            )

    filtered = sum_channels / sum_weights[None]
    # sigma < 0.3: passthrough (epf.rs:64-69)
    keep = sigma < 0.3
    return jnp.where(keep[None], center, filtered)


def sigma_map_from_blocks(sigma_blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    """Expand the per-8x8-block sigma grid to a per-pixel [h, w] map."""
    m = np.repeat(np.repeat(sigma_blocks, 8, axis=0), 8, axis=1)
    return np.ascontiguousarray(m[:h, :w]).astype(np.float32)


def apply_gabor(planes, weights3) -> list:
    """Gaborish on the 3 color planes with per-channel weights."""
    return [gabor(p, tuple(w)) for p, w in zip(planes, weights3)]


def apply_epf(planes, sigma, epf_params) -> "jax.Array":
    """Full EPF: steps selected by iters (filter/epf.rs:45-88).

    JXL_TPU_PALLAS_EPF=1 routes through the hand-written Pallas kernel
    (ops/pallas/epf.py, bit-exact vs this path); the default jnp
    formulation compiles to fully-fused XLA stencils which already run at
    HBM speed on TPU.
    """
    import os

    if os.environ.get("JXL_TPU_PALLAS_EPF"):
        from .pallas.epf import epf_step_pallas as step_fn
    else:
        step_fn = epf_step
    x = jnp.stack([jnp.asarray(p) for p in planes])
    sigma = jnp.asarray(sigma)
    cs = tuple(epf_params.channel_scale)
    bsm = float(epf_params.border_sad_mul)
    if epf_params.iters == 3:
        x = step_fn(x, sigma, 0, cs, float(epf_params.pass0_sigma_scale), bsm)
    if epf_params.iters >= 1:
        x = step_fn(x, sigma, 1, cs, 1.0, bsm)
    if epf_params.iters >= 2:
        x = step_fn(x, sigma, 2, cs, float(epf_params.pass2_sigma_scale), bsm)
    return x
