"""Pallas TPU kernel for the edge-preserving filter.

The EPF is the decoder's heaviest stencil (SURVEY.md §3.2: per-pass SAD
over 5 offsets x 12 kernel taps x 3 channels for step 0). The jnp
formulation (ops/filters.py) materializes ~60 shifted planes and leans on
XLA fusion; this kernel streams row strips through VMEM with the 3-row
halo resident (frame/lib.rs:626-649 halo contract), so HBM traffic is
exactly one read + one write per plane and all the SAD arithmetic runs
from VMEM on the VPU.

Grid: strips of TILE_H rows. The input stays in HBM (pl.ANY) and each
program DMAs its strip + halo into VMEM scratch. Falls back to interpret
mode off-TPU (used by the CPU equivalence tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..filters import _EPF_DIST, _EPF_KERNEL

PAD = 4  # halo is 3; padded to 4 so DMA row slices are 8-aligned (64+2*4)
TILE_H = 32  # strip height; 32+2*PAD DMA slices stay 8-aligned, fits VMEM


def _epf_tile_kernel(planes_ref, sigma_ref, out_ref, scratch, sem, *, step,
                     channel_scale, step_multiplier, border_sad_mul,
                     tile_h, width):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    y0 = i * tile_h

    copy = pltpu.make_async_copy(
        planes_ref.at[:, pl.ds(y0, tile_h + 2 * PAD), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    x = scratch[...]
    sigma = sigma_ref[...]
    h, w = tile_h, width

    def shift(c, dx, dy):
        # all offsets are compile-time constants: plain static slicing
        return x[c, PAD + dy : PAD + dy + h, PAD + dx : PAD + dx + w]

    yy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)) % 8
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 8
    border = (yy == 0) | (yy == 7) | (xx == 0) | (xx == 7)
    sm = jnp.where(border, step_multiplier * border_sad_mul, step_multiplier)

    neg_inv_sigma = (6.6 * (np.float32(1.0 / np.sqrt(2.0)) - 1.0) / sigma) * sm

    center = jnp.stack([shift(c, 0, 0) for c in range(3)])
    sum_weights = jnp.ones((h, w), dtype=jnp.float32)
    sum_channels = center

    for kx, ky in _EPF_KERNEL[step]:
        dist = jnp.zeros((h, w), dtype=jnp.float32)
        for c in range(3):
            acc = jnp.zeros((h, w), dtype=jnp.float32)
            for ix, iy in _EPF_DIST[step]:
                acc = acc + jnp.abs(
                    shift(c, kx + ix, ky + iy) - shift(c, ix, iy)
                )
            dist = dist + np.float32(channel_scale[c]) * acc
        weight = jnp.maximum(1.0 + dist * neg_inv_sigma, 0.0)
        sum_weights = sum_weights + weight
        neigh = jnp.stack([shift(c, kx, ky) for c in range(3)])
        sum_channels = sum_channels + weight[None] * neigh

    filtered = sum_channels / sum_weights[None]
    keep = sigma < 0.3
    out_ref[...] = jnp.where(keep[None], center, filtered)


@functools.lru_cache(maxsize=32)
def _build_epf_call(height, width, step, channel_scale, step_multiplier,
                    border_sad_mul, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile_h = min(TILE_H, height)
    n_tiles = -(-height // tile_h)
    padded_h = n_tiles * tile_h
    # lane-aligned compute width; DMA'd strips must be 128-aligned in the
    # lane dim, so the padded input carries one extra 128 block of columns
    w_al = -(-width // 128) * 128
    total_w = w_al + 128

    kernel = functools.partial(
        _epf_tile_kernel,
        step=step,
        channel_scale=channel_scale,
        step_multiplier=np.float32(step_multiplier),
        border_sad_mul=np.float32(border_sad_mul),
        tile_h=tile_h,
        width=w_al,
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, w_al), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((3, tile_h, w_al), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, padded_h, w_al), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2 * PAD, total_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(planes, sigma):
        # symmetric-mirror pad (util.rs mirror); extend rows to the tile
        # grid and columns to the aligned compute width
        extra = padded_h - height
        p = jnp.pad(
            planes,
            ((0, 0), (PAD, PAD + extra), (PAD, PAD)),
            mode="symmetric",
        )
        p = jnp.pad(p, ((0, 0), (0, 0), (0, total_w - p.shape[2])),
                    mode="edge")
        s = jnp.pad(sigma, ((0, extra), (0, w_al - width)), mode="edge")
        out = call(p, s)
        return out[:, :height, :width]

    return run


def epf_step_pallas(planes, sigma, step: int, channel_scale,
                    step_multiplier: float, border_sad_mul: float,
                    interpret: bool | None = None):
    """Pallas EPF pass; same contract as ops.filters.epf_step."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    _, h, w = planes.shape
    run = _build_epf_call(
        h, w, step, tuple(float(c) for c in channel_scale),
        float(step_multiplier), float(border_sad_mul), bool(interpret),
    )
    return run(jnp.asarray(planes), jnp.asarray(sigma))
