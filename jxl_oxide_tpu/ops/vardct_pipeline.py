"""Device-side VarDCT decode pipeline stages.

Behavioral parity: jxl-render/src/vardct/mod.rs (dequant_hf_varblock,
chroma_from_luma_{lf,hf}, adaptive_lf_smoothing, copy_lf_dequant,
transform_with_lf). The reference runs these per-group on CPU threads; here
each stage is one whole-plane jitted XLA op (VPU elementwise + MXU matmuls),
with per-varblock raggedness resolved by host-built gather/scatter plans
(see render/vardct.py) so every shape is static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .varblock import inverse_varblock_batch

__all__ = [
    "dequant_plane",
    "cfl_plane",
    "adaptive_lf_smoothing",
    "transform_buckets",
]


@functools.partial(jax.jit, static_argnames=("quant_bias", "quant_bias_numerator"))
def dequant_plane(raw_plane, dmap, quant_bias: float, quant_bias_numerator: float):
    """HF coefficient dequantization over a whole coefficient plane.

    raw_plane: int32 quantized coefficients (vardct/mod.rs:443-541 reads
    them as raw bits of the f32 buffer; we keep them as int32 planes).
    dmap: per-position dequant multiplier map (matrix value x 65536 /
    (global_scale * hf_mul) * qm_scale), host-assembled per frame.
    """
    q = raw_plane.astype(jnp.float32)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    biased = jnp.where(
        jnp.abs(q) <= 1.0,
        q * quant_bias,
        q - quant_bias_numerator / safe_q,
    )
    return biased * dmap


@jax.jit
def cfl_plane(coeff_x, coeff_y, coeff_b, kx_map, kb_map):
    """Chroma-from-luma: x += kx*y, b += kb*y with per-64x64-tile factors
    expanded to full-resolution maps on the host (vardct/mod.rs:570-607)."""
    return coeff_x + kx_map * coeff_y, coeff_b + kb_map * coeff_y


@jax.jit
def cfl_lf(lf_x, lf_y, lf_b, kx: jax.Array, kb: jax.Array):
    """LF chroma-from-luma with scalar factors (vardct/mod.rs:544-567)."""
    return lf_x + kx * lf_y, lf_b + kb * lf_y


@jax.jit
def adaptive_lf_smoothing(lf_x, lf_y, lf_b, lf_scale):
    """Self-guided LF smoothing (generic/mod.rs:10-105).

    Interior pixels get a 3x3 weighted average gated by the per-channel
    quantization step (lf_scale = 512 * m_lf / (global_scale * quant_lf));
    borders are left untouched. Expressed as whole-plane shifts: pure VPU.
    """
    scale_self = 0.052262735
    scale_side = 0.2034514
    scale_diag = 0.03348292

    def wa(img):
        side = (
            jnp.roll(img, 1, axis=1)
            + jnp.roll(img, -1, axis=1)
            + jnp.roll(img, 1, axis=0)
            + jnp.roll(img, -1, axis=0)
        )
        diag = (
            jnp.roll(jnp.roll(img, 1, axis=0), 1, axis=1)
            + jnp.roll(jnp.roll(img, 1, axis=0), -1, axis=1)
            + jnp.roll(jnp.roll(img, -1, axis=0), 1, axis=1)
            + jnp.roll(jnp.roll(img, -1, axis=0), -1, axis=1)
        )
        return img * scale_self + side * scale_side + diag * scale_diag

    planes = [lf_x, lf_y, lf_b]
    was = [wa(p) for p in planes]
    gap = jnp.full(lf_x.shape, 0.5, dtype=jnp.float32)
    for p, w, s in zip(planes, was, lf_scale):
        gap = jnp.maximum(gap, jnp.abs(w - p) / s)
    gap_scale = jnp.maximum(3.0 - 4.0 * gap, 0.0)

    h, w_ = lf_x.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w_)[None, :]
    interior = (yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w_ - 1)
    out = []
    for p, w in zip(planes, was):
        smoothed = (w - p) * gap_scale + p
        out.append(jnp.where(interior, smoothed, p))
    return tuple(out)


def gather_blocks(plane, idx):
    """plane.ravel()[idx] with idx [n, h, w] int32 (OOB -> 0)."""
    flat = plane.reshape(-1)
    return jnp.take(flat, idx, mode="fill", fill_value=0)


def scatter_blocks(plane, idx, values):
    """plane.ravel()[idx] = values (OOB dropped)."""
    flat = plane.reshape(-1)
    flat = flat.at[idx.reshape(-1)].set(values.reshape(-1), mode="drop")
    return flat.reshape(plane.shape)


def transform_buckets(coeff_plane, lf_plane, out_plane, buckets):
    """Apply all varblock inverse transforms for one channel.

    buckets: list of (dct_select, coeff_idx [n,H,W], lf_idx [n,bh,bw],
    out_idx [n,H,W]) numpy index arrays into the flattened planes.
    Each bucket is one batched transform (MXU matmuls over the batch).
    """
    for sel, coeff_idx, lf_idx, out_idx in buckets:
        coeffs = gather_blocks(coeff_plane, jnp.asarray(coeff_idx))
        lf = gather_blocks(lf_plane, jnp.asarray(lf_idx))
        pixels = inverse_varblock_batch(coeffs, lf, sel)
        out_plane = scatter_blocks(out_plane, jnp.asarray(out_idx), pixels)
    return out_plane
