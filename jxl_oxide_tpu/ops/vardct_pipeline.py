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
    "build_fused_pipeline",
    "build_fused_pipeline_sharded",
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


def _sep_apply_4d(x4, Bv, Bh_, C, ny, v0, nx, h0):
    """Separable per-tile 2-D transform over a dense region given in the
    4-D einsum view [C, ny, v0, Wr] (Wr = nx*h0), with NO tile
    transposes: a vertical within-tile einsum keeps the full width in
    the lane dimension, then one [C, Hr, Wr] transpose and the same
    trick horizontally. ~40x faster on TPU than the [n, v0, h0]
    batched-tile layout, whose 8-wide lanes starve the VPU/MXU.

    Bv: [v0, v0] vertical basis (out_row <- coeff_row),
    Bh_: [h0, h0] horizontal basis (out_col <- coeff_col).
    """
    Hr, Wr = ny * v0, nx * h0
    v = jnp.einsum(
        "yj,cbjw->cbyw", Bv, x4,
        preferred_element_type=jnp.float32,
    ).reshape(C, Hr, Wr)
    vt = v.swapaxes(1, 2).reshape(C, nx, h0, Hr)
    h = jnp.einsum(
        "xj,cbjh->cbxh", Bh_, vt,
        preferred_element_type=jnp.float32,
    ).reshape(C, Wr, Hr)
    return h.swapaxes(1, 2)


def _sep_apply_dense(x, Bv, Bh_, C, ny, v0, nx, h0):
    """_sep_apply_4d on a [C, Hr, Wr] input."""
    return _sep_apply_4d(
        x.reshape(C, ny, v0, nx * h0), Bv, Bh_, C, ny, v0, nx, h0
    )


def dense_transform_channels(biased, lf_planes, kx_map, kb_map, code_grid,
                             mul_grid, entries, matrices, global_scale,
                             qm_scale):
    """All varblock inverse transforms as DENSE per-(type, residue-offset)
    passes — no gathers or scatters, which are pathologically slow on TPU
    (the former [n, h, w] flat-index take/scatter made the pipeline ~100x
    slower than its MXU speed-of-light).

    Varblock types partition the 8x8-block grid, so for each entry
    (dct_select, oy, ox) the plane is retiled at that block offset with
    pure reshapes, ALL aligned positions run through one batched inverse
    transform, and only tiles whose anchor in `code_grid` carries this
    entry's id contribute (masked add). The separable DCTnxm family
    (incl. DCT8 and every rectangular size) runs fully dense with the
    width kept in the lane dimension (_sep_apply_dense); only the
    non-separable 8x8 specials (DCT2/DCT4/Hornuss/DCT4x8/AFV) fall back
    to the batched-tile layout.

    biased:   [C, H, W] f32 (dequant bias already applied)
    lf_planes:[C, BH, BW] f32 dequantized+smoothed LF (DC source)
    kx_map/kb_map: [H, W] CfL factor maps, scalar floats (constant
    correlation grids), or None for single-channel
    code_grid:[BH, BW] int, entry id at each varblock anchor, -1 elsewhere
    mul_grid: [BH, BW] f32 hf_mul at anchors
    entries:  tuple of (dct_select, oy, ox) — compile-time plan
    matrices: {sel: [C, h, w]} dequant matrix constants
    """
    from ..models.vardct import TransformType as _T
    from .dct import dct_basis_forward, dct_basis_inverse
    from .varblock import scale_f_map

    C, H, W = biased.shape
    BH, BW = code_grid.shape
    out = jnp.zeros((C, H, W), dtype=jnp.float32)
    qm = np.asarray(qm_scale, dtype=np.float32)
    gs = np.float32(65536.0 / global_scale)

    for eid, (sel, oy, ox) in enumerate(entries):
        tw, th = _T.SELECT_SIZE[sel]   # x-span, y-span in 8px blocks
        h0, w0 = th * 8, tw * 8
        ny = (BH - oy) // th
        nx = (BW - ox) // tw
        if ny <= 0 or nx <= 0:
            continue
        ys, xs = oy * 8, ox * 8
        Hr, Wr = ny * h0, nx * w0
        # ALL per-tile factors are built as broadcasts along existing
        # axes of the 4-D einsum view [C, ny, h0, Wr] — no
        # broadcast_to+reshape expansion (which materializes a full-size
        # intermediate per factor and defeats XLA fusion; the 4-D form
        # measured 9x faster for a pure-DCT8 plane)
        region4 = biased[:, ys:ys + Hr, xs:xs + Wr].reshape(C, ny, h0, Wr)
        matv = np.asarray(matrices[sel], dtype=np.float32)
        if matv.nbytes * nx <= (4 << 20):
            mat4 = jnp.asarray(np.tile(matv, (1, 1, nx)))  # [C, h0, Wr]
        else:  # rare huge-tile-x-wide-plane case: tile on device
            mat4 = jnp.tile(jnp.asarray(matv), (1, 1, nx))
        mul_b = mul_grid[oy:oy + ny * th:th, ox:ox + nx * tw:tw]
        scale = gs * jnp.asarray(qm)[:, None, None] / mul_b[None]
        scale4 = jnp.repeat(scale, w0, axis=-1)        # [C, ny, Wr]
        deq = (region4 * mat4[:, None]) * scale4[:, :, None, :]
        if kx_map is not None:
            if isinstance(kx_map, float):
                # constant factor grids (all-zero correlation grids are
                # common): no [H, W] map materialization
                kx4 = np.float32(kx_map)
                kb4 = np.float32(kb_map)
            else:
                kx4 = kx_map[ys:ys + Hr, xs:xs + Wr].reshape(ny, h0, Wr)
                kb4 = kb_map[ys:ys + Hr, xs:xs + Wr].reshape(ny, h0, Wr)
            deq = jnp.stack([
                deq[0] + kx4 * deq[1],
                deq[1],
                deq[2] + kb4 * deq[1],
            ])

        lowrank = None
        if th * tw == 1 and sel != _T.DCT8:
            from .varblock import special_lowrank_factors

            lowrank = special_lowrank_factors(sel, max_rank=20)
        separable = sel == _T.DCT8 or th * tw > 1 or lowrank is not None

        # anchor mask applied to the transform INPUT: every transform is
        # linear, so zeroed tiles produce zeroed pixels and no output
        # masking pass is needed (one less full-plane op per entry)
        anchors = code_grid[oy:oy + ny * th:th, ox:ox + nx * tw:tw] == eid
        am4 = jnp.repeat(anchors, w0, axis=-1)         # [ny, Wr]
        if separable:
            # corner mask [h0, Wr]: within-tile rows < th, cols < tw
            corner = np.zeros((h0, Wr), dtype=bool)
            corner[:th, :] = np.tile(
                (np.arange(Wr) % w0 < tw)[None, :], (th, 1))
            corner4 = jnp.asarray(corner)
            if th * tw == 1:
                # 1x1 types: the LF sample IS the DC input slot
                lf_a = lf_planes[:, oy:oy + ny, ox:ox + nx]
                lf4 = jnp.repeat(lf_a, w0, axis=-1)[:, :, None, :]
            else:
                # multi-block DCTnxm: embed fwd-DCT of the LF tile into
                # the low corner (transform_common.rs:11-77), all dense
                lf5 = lf_planes[:, oy:oy + ny * th, ox:ox + nx * tw]
                av = jnp.asarray(dct_basis_forward(th))
                ah = jnp.asarray(dct_basis_forward(tw))
                lf_c = _sep_apply_dense(lf5, av, ah, C, ny, th, nx, tw)
                sf = scale_f_map(th, tw)               # [th, tw] const
                sf4 = jnp.asarray(np.tile(sf, (1, nx)))  # [th, nx*tw]
                lf_c4 = lf_c.reshape(C, ny, th, nx * tw) / sf4[None, None]
                # place each tile's [th, tw] corner into the [h0, w0]
                # grid: pad the per-tile view out to the full tile size
                lf4 = jnp.pad(
                    lf_c4.reshape(C, ny, th, nx, tw),
                    ((0, 0), (0, 0), (0, h0 - th), (0, 0), (0, w0 - tw)),
                ).reshape(C, ny, h0, Wr)
            deq = jnp.where(
                am4[None, :, None, :] & corner4[None, None], lf4,
                jnp.where(am4[None, :, None, :], deq, 0.0))
            if lowrank is not None:
                # non-separable special as a sum of Kronecker terms
                vs, hs = lowrank
                pix = _sep_apply_4d(
                    deq, jnp.asarray(vs[0]), jnp.asarray(hs[0]),
                    C, ny, h0, nx, w0)
                for q in range(1, vs.shape[0]):
                    pix = pix + _sep_apply_4d(
                        deq, jnp.asarray(vs[q]), jnp.asarray(hs[q]),
                        C, ny, h0, nx, w0)
            else:
                bv = jnp.asarray(dct_basis_inverse(h0))
                bh_ = jnp.asarray(dct_basis_inverse(w0))
                pix = _sep_apply_4d(deq, bv, bh_, C, ny, h0, nx, w0)
        else:
            # non-separable 8x8 specials: batched-tile layout (inputs
            # pre-masked, incl. the LF/DC values of non-anchor tiles)
            deq = jnp.where(am4[None, :, None, :], deq, 0.0)
            tiles = deq.reshape(C, ny, h0, nx, w0).transpose(0, 1, 3, 2, 4)
            lf_t = jnp.where(anchors[None],
                             lf_planes[:, oy:oy + ny, ox:ox + nx], 0.0)
            pix = inverse_varblock_batch(
                tiles.reshape(C * ny * nx, h0, w0),
                lf_t.reshape(C * ny * nx, 1, 1),
                sel,
            ).reshape(C, ny, nx, h0, w0).transpose(0, 1, 3, 2, 4).reshape(
                C, Hr, Wr)

        out = out.at[:, ys:ys + Hr, xs:xs + Wr].add(pix)
    return out


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


def build_fused_pipeline(plane_shape, lf_shape, entries,
                         matrices, quant_bias, quant_bias_numerator,
                         global_scale, qm_scale, lf_scale,
                         skip_smoothing: bool,
                         cfl_lf_k=(0.0, 1.0), cfl_colour_factor=84,
                         cfl_base=(0.0, 1.0),
                         gabor_weights=None, epf_params=None,
                         sparse_coeff_n: int | None = None,
                         crop=None, embed=None, cfl_const: bool = False):
    """One jitted function for the whole per-frame device pipeline:
    LF dequant/CfL/smoothing -> HF dequant -> HF CfL -> dense inverse
    transforms -> gaborish -> EPF.

    Everything is ONE XLA computation: a decode is a single dispatch with
    one coefficient upload and one pixel download. Dequant matrices and
    the transform plan are compile-time constants; the per-block entry/
    multiplier grids, CfL factor grids and the EPF sigma grid are small
    runtime inputs expanded on device.

    entries: tuple of (dct_select, oy, ox) — the dense transform plan
    (see dense_transform_channels).
    matrices: {sel: np [3, h, w]} dequant matrices (canonical orientation
    already resolved to the varblock region layout).
    """
    import jax

    H, W = plane_shape
    LH, LW = lf_shape

    def pipeline(coeff, lf_quant, lf_scale_arr, x_grid, b_grid,
                 sigma_blocks, code_grid, mul_grid):
        if sparse_coeff_n is not None:
            # sparse upload: coeff is (flat_idx [N] i32 — or u16 index
            # DELTAS when every gap fits, reconstructed by an on-device
            # cumsum — and values [N] i16), ascending-unique from the
            # host's one-pass extractor and padded with ascending
            # OUT-OF-BOUNDS indices ("drop" removes them), so the
            # sorted+unique scatter fast path applies (6x over plain
            # scatter-add on TPU). Cuts the host->device transfer by the
            # sparsity factor; the u16-delta form another ~33% (the
            # tunnel-attached e2e path is upload-bound).
            c_idx, c_val = coeff
            if c_idx.dtype == jnp.uint16:
                c_idx = jnp.cumsum(c_idx.astype(jnp.int32)) - 1
            dense = jnp.zeros((3 * H * W,), dtype=jnp.int32)
            coeff = dense.at[c_idx].set(
                c_val.astype(jnp.int32), mode="drop",
                unique_indices=True, indices_are_sorted=True,
            ).reshape(3, H, W)
        # --- LF: dequant + CfL + smoothing ---
        lf_planes = lf_quant.astype(jnp.float32) * lf_scale_arr[:, None, None]
        kx0, kb0 = cfl_lf_k
        lf_planes = jnp.stack([
            lf_planes[0] + np.float32(kx0) * lf_planes[1],
            lf_planes[1],
            lf_planes[2] + np.float32(kb0) * lf_planes[1],
        ])
        if not skip_smoothing:
            sm = adaptive_lf_smoothing(
                lf_planes[0], lf_planes[1], lf_planes[2], lf_scale
            )
            lf_planes = jnp.stack(list(sm))

        # --- HF CfL factor maps from per-64x64 grids, expanded on device
        # (all-zero correlation grids collapse to scalar factors: no
        # [H, W] map materialization, detected by the host) ---
        if cfl_const:
            kx_map = float(cfl_base[0])
            kb_map = float(cfl_base[1])
        else:
            kx_map = (np.float32(cfl_base[0])
                      + x_grid.astype(jnp.float32)
                      / np.float32(cfl_colour_factor))
            kb_map = (np.float32(cfl_base[1])
                      + b_grid.astype(jnp.float32)
                      / np.float32(cfl_colour_factor))
            kx_map = jnp.repeat(jnp.repeat(kx_map, 64, 0), 64, 1)[:H, :W]
            kb_map = jnp.repeat(jnp.repeat(kb_map, 64, 0), 64, 1)[:H, :W]

        # dequant bias (vardct/mod.rs:443-541), dense over the plane
        q = coeff.astype(jnp.float32)
        qbn = np.float32(quant_bias_numerator)
        safe_q = jnp.where(q == 0.0, 1.0, q)
        qb = jnp.asarray(quant_bias, dtype=jnp.float32)[:, None, None]
        biased = jnp.where(jnp.abs(q) <= 1.0, q * qb, q - qbn / safe_q)

        out = dense_transform_channels(
            biased, lf_planes, kx_map, kb_map,
            code_grid, mul_grid.astype(jnp.float32), entries, matrices,
            global_scale, qm_scale,
        )

        # --- restoration filters, fused in ---
        if gabor_weights is not None:
            from .filters import gabor

            out = jnp.stack([
                gabor(out[c], tuple(gabor_weights[c])) for c in range(3)
            ])
        if epf_params is not None:
            from .filters import epf_step

            sigma = jnp.repeat(jnp.repeat(sigma_blocks, 8, 0), 8, 1)[:H, :W]
            cs = tuple(epf_params.channel_scale)
            bsm = float(epf_params.border_sad_mul)
            if epf_params.iters == 3:
                out = epf_step(out, sigma, 0, cs,
                               float(epf_params.pass0_sigma_scale), bsm)
            if epf_params.iters >= 1:
                out = epf_step(out, sigma, 1, cs, 1.0, bsm)
            if epf_params.iters >= 2:
                out = epf_step(out, sigma, 2, cs,
                               float(epf_params.pass2_sigma_scale), bsm)
        if embed is not None:
            # ROI rect: place the computed sub-plane into a zero canvas at
            # its frame position (downstream stages keep full-size planes;
            # the zeros are cropped away before the color tail)
            fh, fw, oy, ox = embed
            full = jnp.zeros((3, fh, fw), dtype=jnp.float32)
            out = jax.lax.dynamic_update_slice(full, out, (0, oy, ox))
        if crop is not None:
            # final frame-size crop fused in: no separate slice dispatch
            out = out[:, : crop[0], : crop[1]]
        return out

    return jax.jit(pipeline)


def _smooth_local(lf_planes, lf_scale, axis, vloc_lf: int, last_shard: int,
                  lh_valid: int, lw_valid: int, shard_dim: str):
    """Adaptive LF smoothing on a band-sharded LF plane stack
    [3, lh_loc, lw] (rows) or [3, lh, lw_loc] (cols): same arithmetic (and
    operand order) as adaptive_lf_smoothing, with the 1-px neighborhood
    across the shard boundary coming from mesh neighbors and the interior
    mask computed in GLOBAL coordinates (borders keep the unsmoothed
    value, generic/mod.rs:10-105)."""
    from ..parallel.sharded import halo_pad_cols, halo_pad_rows

    if shard_dim == "rows":
        padded = halo_pad_rows(lf_planes, 1, axis, vloc_lf, last_shard)
        p = jnp.pad(padded, ((0, 0), (0, 0), (1, 1)), mode="edge")
    else:
        padded = halo_pad_cols(lf_planes, 1, axis, vloc_lf, last_shard)
        p = jnp.pad(padded, ((0, 0), (1, 1), (0, 0)), mode="edge")
    c = p[:, 1:-1, 1:-1]
    west = p[:, 1:-1, :-2]
    east = p[:, 1:-1, 2:]
    north = p[:, :-2, 1:-1]
    south = p[:, 2:, 1:-1]
    side = west + east + north + south
    diag = p[:, :-2, :-2] + p[:, :-2, 2:] + p[:, 2:, :-2] + p[:, 2:, 2:]
    scale_self = 0.052262735
    scale_side = 0.2034514
    scale_diag = 0.03348292
    was = c * scale_self + side * scale_side + diag * scale_diag

    gap = jnp.full(lf_planes.shape[1:], 0.5, dtype=jnp.float32)
    for ch in range(3):
        gap = jnp.maximum(gap, jnp.abs(was[ch] - lf_planes[ch]) / lf_scale[ch])
    gap_scale = jnp.maximum(3.0 - 4.0 * gap, 0.0)

    idx = jax.lax.axis_index(axis)
    lh_loc, lw_loc = lf_planes.shape[1], lf_planes.shape[2]
    if shard_dim == "rows":
        yy = idx * lh_loc + jnp.arange(lh_loc)[:, None]
        xx = jnp.arange(lw_loc)[None, :]
    else:
        yy = jnp.arange(lh_loc)[:, None]
        xx = idx * lw_loc + jnp.arange(lw_loc)[None, :]
    interior = (
        (yy > 0) & (yy < lh_valid - 1) & (xx > 0) & (xx < lw_valid - 1)
    )
    out = []
    for ch in range(3):
        smoothed = (was[ch] - lf_planes[ch]) * gap_scale + lf_planes[ch]
        out.append(jnp.where(interior, smoothed, lf_planes[ch]))
    return jnp.stack(out)


def build_fused_pipeline_sharded(
    mesh, axis, local_plane_shape, local_lf_shape, entries,
    matrices, quant_bias, quant_bias_numerator,
    global_scale, qm_scale, lf_scale,
    skip_smoothing: bool,
    vloc: int, vloc_lf: int, lf_valid: tuple,
    last_shard: int,
    cfl_lf_k=(0.0, 1.0), cfl_colour_factor=84,
    cfl_base=(0.0, 1.0),
    gabor_weights=None, epf_params=None,
    sparse_coeff_n: int | None = None,
    crop=None, cfl_const: bool = False,
    shard_dim: str = "rows",
):
    """The fused per-frame device pipeline under shard_map: the REAL
    decoder program (dense varblock transforms, per-block dequant, CfL
    grids, LF smoothing, gaborish, EPF sigma grids) sharded by bands of
    groups across the mesh — the reference's per-group data parallelism
    (jxl-render/src/vardct/mod.rs:250-376) as SPMD, with the halo contract
    of jxl-frame/src/lib.rs:626-649 carried by lax.ppermute exchanges.

    shard_dim selects row bands (tall frames) or column bands (wide
    frames). Shapes are LOCAL (per shard): the sharded plane dimension is
    padded to n_shards * loc with loc a multiple of group_dim, so no
    varblock crosses a shard boundary (varblocks never leave their
    256x256 group), and shard bases stay residue-aligned for every
    transform span (spans divide the group block count). Frames whose
    group-band count does not divide the mesh get fully-padded trailing
    shards; `last_shard` is the shard index holding the valid image edge
    at local offset `vloc` (`vloc_lf` on the LF grid). The per-block
    entry-id and hf_mul grids shard like the sigma grid.

    Returns (jitted_fn, in_shardings): fn(coeff [3, Hp, W] int, lf_quant
    [3, LHp, LW], lf_scale_arr [3], x_grid/b_grid [h64p, w64] int,
    sigma_blocks [bhp, bw] f32, code_grid [bhp, bw] int16,
    mul_grid [bhp, bw] f32) -> [3, Hp, W] f32 where the sharded-dim
    global dimension is sharded over `axis`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from ..parallel.sharded import halo_pad_cols, halo_pad_rows

    Hl, Wl = local_plane_shape
    lh_valid, lw_valid = lf_valid
    by_rows = shard_dim == "rows"
    halo_pad = halo_pad_rows if by_rows else halo_pad_cols

    def pipeline(coeff, lf_quant, lf_scale_arr, x_grid, b_grid,
                 sigma_blocks, code_grid, mul_grid):
        if sparse_coeff_n is not None:
            # per-shard sparse upload: (local flat idx [1, N], values
            # [1, N]), ascending-unique with ascending out-of-bounds
            # pads ("drop" removes them) -> sorted+unique scatter fast
            # path, as in the single-device builder
            c_idx, c_val = coeff
            dense = jnp.zeros((3 * Hl * Wl,), dtype=jnp.int32)
            coeff = dense.at[c_idx[0]].set(
                c_val[0].astype(jnp.int32), mode="drop",
                unique_indices=True, indices_are_sorted=True,
            ).reshape(3, Hl, Wl)
        # --- LF: dequant + CfL + smoothing (local band) ---
        lf_planes = lf_quant.astype(jnp.float32) * lf_scale_arr[:, None, None]
        kx0, kb0 = cfl_lf_k
        lf_planes = jnp.stack([
            lf_planes[0] + np.float32(kx0) * lf_planes[1],
            lf_planes[1],
            lf_planes[2] + np.float32(kb0) * lf_planes[1],
        ])
        if not skip_smoothing:
            lf_planes = _smooth_local(
                lf_planes, lf_scale, axis, vloc_lf, last_shard,
                lh_valid, lw_valid, shard_dim,
            )

        # --- HF CfL factor maps from per-64x64 grids (shard-local band) ---
        if cfl_const:
            kx_map = float(cfl_base[0])
            kb_map = float(cfl_base[1])
        else:
            kx_map = (np.float32(cfl_base[0])
                      + x_grid.astype(jnp.float32)
                      / np.float32(cfl_colour_factor))
            kb_map = (np.float32(cfl_base[1])
                      + b_grid.astype(jnp.float32)
                      / np.float32(cfl_colour_factor))
            kx_map = jnp.repeat(jnp.repeat(kx_map, 64, 0), 64, 1)[:Hl, :Wl]
            kb_map = jnp.repeat(jnp.repeat(kb_map, 64, 0), 64, 1)[:Hl, :Wl]

        # dense dequant bias, then the dense per-(type, residue) engine
        # over the shard-local band (same plan as single-device: shard
        # bases are whole group bands, so block residues are
        # shard-invariant)
        q = coeff.astype(jnp.float32)
        qbn = np.float32(quant_bias_numerator)
        safe_q = jnp.where(q == 0.0, 1.0, q)
        qb = jnp.asarray(quant_bias, dtype=jnp.float32)[:, None, None]
        biased = jnp.where(jnp.abs(q) <= 1.0, q * qb, q - qbn / safe_q)
        out = dense_transform_channels(
            biased, lf_planes, kx_map, kb_map,
            code_grid, mul_grid.astype(jnp.float32), entries, matrices,
            global_scale, qm_scale,
        )

        # --- restoration filters with ICI halo exchange ---
        if gabor_weights is not None:
            from .filters import gabor

            padded = halo_pad(out, 1, axis, vloc, last_shard)
            out = jnp.stack([
                gabor(padded[c], tuple(gabor_weights[c]),
                      prepad_rows=1 if by_rows else 0,
                      prepad_cols=0 if by_rows else 1)
                for c in range(3)
            ])
        if epf_params is not None:
            from .filters import epf_step

            sigma = jnp.repeat(
                jnp.repeat(sigma_blocks, 8, 0), 8, 1
            )[:Hl, :Wl]
            cs = tuple(epf_params.channel_scale)
            bsm = float(epf_params.border_sad_mul)

            def pass_(x, step, mult):
                # each pass exchanges 3 fresh halo rows/cols: the next
                # pass's cross-shard neighborhood is the PREVIOUS pass's
                # output, as in the sequential whole-plane passes
                # (filter/epf.rs)
                padded = halo_pad(x, 3, axis, vloc, last_shard)
                return epf_step(padded, sigma, step, cs, mult, bsm,
                                prepad_rows=3 if by_rows else 0,
                                prepad_cols=0 if by_rows else 3)

            if epf_params.iters == 3:
                out = pass_(out, 0, float(epf_params.pass0_sigma_scale))
            if epf_params.iters >= 1:
                out = pass_(out, 1, 1.0)
            if epf_params.iters >= 2:
                out = pass_(out, 2, float(epf_params.pass2_sigma_scale))
        return out

    if by_rows:
        spec_c = P(None, axis, None)
        spec_grid = P(axis, None)
    else:
        spec_c = P(None, None, axis)
        spec_grid = P(None, axis)
    coeff_spec = (
        (P(axis, None), P(axis, None))
        if sparse_coeff_n is not None
        else spec_c
    )
    in_specs = [coeff_spec, spec_c, P(None), spec_grid, spec_grid,
                spec_grid, spec_grid, spec_grid]
    fn = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=spec_c,
    )

    def _shard_of(spec):
        if isinstance(spec, tuple):
            return tuple(NamedSharding(mesh, x) for x in spec)
        return NamedSharding(mesh, spec)

    shardings = tuple(_shard_of(s) for s in in_specs)
    if crop is not None:
        # frame-size crop fused into the same program (after the
        # shard_map body; GSPMD reshards the row remainder)
        inner = fn

        def fn(*args):
            return inner(*args)[:, : crop[0], : crop[1]]

    return jax.jit(fn), shardings


def _triangle_up2(p, axis: int):
    """JPEG chroma 2x triangle upsample along one axis, clamp-to-edge
    (filter/ycbcr.rs apply_jpeg_upsampling_single): out[2j] leans on the
    previous sample, out[2j+1] on the next. Device twin of
    render/render.py _upsample2x_triangle, inlined into the fused
    subsampled program.

    The blend is written adds-first with one exact *0.25 at the end
    ((prev + 3p)/4 with 3p = (p+p)+p): a mul-then-add form lets LLVM
    contract to FMA differently in the single-device and sharded
    programs, which broke sharded-vs-single bit-identity by 1-2 ulp.
    Adds followed by a power-of-two multiply cannot contract."""
    p0 = jnp.moveaxis(p, axis, 0)
    prev = jnp.concatenate([p0[:1], p0[:-1]], axis=0)
    nxt = jnp.concatenate([p0[1:], p0[-1:]], axis=0)
    p3 = (p0 + p0) + p0
    a = (prev + p3) * 0.25
    b = (p3 + nxt) * 0.25
    out = jnp.stack([a, b], axis=1).reshape((2 * p0.shape[0],) + p0.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def build_fused_pipeline_subsampled(
    plane_shapes, lf_shapes, full_shape, entries3, matrices3,
    quant_bias, quant_bias_numerator,
    global_scale, qm_scale, lf_scale,
    gabor_weights=None, epf_params=None,
    sparse_coeff_n=None,
    crop=None, embed=None,
):
    """One jitted program for a chroma-subsampled (do_ycbcr, 4:2:0/4:2:2/
    4:4:0) VarDCT frame: per-channel LF dequant -> HF dequant -> dense
    inverse transforms at each channel's stored geometry, then the JPEG
    triangle chroma upsample (image.rs:448-486) and the restoration
    filters (gabor/EPF) fused into the SAME dispatch at full resolution.
    No CfL (the reference skips LF and HF CfL for subsampled frames,
    vardct/mod.rs:184,355) and no adaptive LF smoothing (the reference
    requires equal-size LF planes; subsampled streams set
    skip_adaptive_lf_smoothing).

    plane_shapes/lf_shapes: per-channel [x, y, b] stored geometries;
    full_shape: (Hr, Wr) rounded full resolution; entries3/matrices3/
    qm_scale/lf_scale/quant_bias: per-channel plans and constants.
    sparse_coeff_n: per-channel tuple of sparse upload sizes (None
    entries = dense upload for that channel).

    fn(c0, l0, code0, mul0, c1, l1, code1, mul1, c2, l2, code2, mul2,
    sigma_blocks) -> [3, crop_h, crop_w] f32 full-resolution planes
    (still YCbCr; the BT.601 conversion happens in the color tail)."""
    Hr, Wr = full_shape

    def pipeline(*args):
        per_chan = [args[4 * c : 4 * c + 4] for c in range(3)]
        sigma_blocks = args[12]
        planes = []
        for c, (coeff, lf_quant, code_grid, mul_grid) in enumerate(per_chan):
            Hc, Wc = plane_shapes[c]
            if sparse_coeff_n is not None and sparse_coeff_n[c] is not None:
                c_idx, c_val = coeff
                if c_idx.dtype == jnp.uint16:  # index deltas (see above)
                    c_idx = jnp.cumsum(c_idx.astype(jnp.int32)) - 1
                dense = jnp.zeros((Hc * Wc,), dtype=jnp.int32)
                coeff = dense.at[c_idx].set(
                    c_val.astype(jnp.int32), mode="drop",
                    unique_indices=True, indices_are_sorted=True,
                ).reshape(Hc, Wc)
            lf_plane = lf_quant.astype(jnp.float32) * np.float32(lf_scale[c])
            q = coeff.astype(jnp.float32)
            qbn = np.float32(quant_bias_numerator)
            qb = np.float32(quant_bias[c])
            safe_q = jnp.where(q == 0.0, 1.0, q)
            biased = jnp.where(jnp.abs(q) <= 1.0, q * qb, q - qbn / safe_q)
            outc = dense_transform_channels(
                biased[None], lf_plane[None], None, None,
                code_grid, mul_grid.astype(jnp.float32),
                entries3[c], {s: np.asarray(m)[None]
                              for s, m in matrices3[c].items()},
                global_scale, (qm_scale[c],),
            )[0]
            # chroma upsample to full res: horizontal then vertical
            # (render.rs order), shapes static under trace
            while outc.shape[1] < Wr:
                outc = _triangle_up2(outc, 1)
            while outc.shape[0] < Hr:
                outc = _triangle_up2(outc, 0)
            planes.append(outc[:Hr, :Wr])
        out = jnp.stack(planes)

        if gabor_weights is not None:
            from .filters import gabor

            out = jnp.stack([
                gabor(out[c], tuple(gabor_weights[c])) for c in range(3)
            ])
        if epf_params is not None:
            from .filters import epf_step

            sigma = jnp.repeat(jnp.repeat(sigma_blocks, 8, 0), 8, 1)[:Hr, :Wr]
            cs = tuple(epf_params.channel_scale)
            bsm = float(epf_params.border_sad_mul)
            if epf_params.iters == 3:
                out = epf_step(out, sigma, 0, cs,
                               float(epf_params.pass0_sigma_scale), bsm)
            if epf_params.iters >= 1:
                out = epf_step(out, sigma, 1, cs, 1.0, bsm)
            if epf_params.iters >= 2:
                out = epf_step(out, sigma, 2, cs,
                               float(epf_params.pass2_sigma_scale), bsm)
        if embed is not None:
            fh, fw, oy, ox = embed
            full = jnp.zeros((3, fh, fw), dtype=jnp.float32)
            out = jax.lax.dynamic_update_slice(full, out, (0, oy, ox))
        if crop is not None:
            out = out[:, : crop[0], : crop[1]]
        return out

    return jax.jit(pipeline)


def build_fused_pipeline_subsampled_sharded(
    mesh, axis, local_plane_shapes, local_lf_shapes, local_full_shape,
    entries3, matrices3,
    quant_bias, quant_bias_numerator,
    global_scale, qm_scale, lf_scale,
    vloc: int, last_shard: int,
    gabor_weights=None, epf_params=None,
    crop=None, shard_dim: str = "rows",
):
    """build_fused_pipeline_subsampled under shard_map: bands of whole
    256px groups shard across the mesh axis (rows for tall frames,
    columns for wide ones); each channel's stored plane shards at its
    own shifted band size (loc >> shift — group bands stay whole in
    every channel's coordinates because varblocks never leave their
    group). The triangle chroma upsample exchanges ONE stored-resolution
    halo row/column per subsampled axis over ICI (clamp-to-edge == the
    1-wide mirror halo_pad provides); the full-resolution filter tail
    (gabor 1px, EPF 3px per pass) is the same halo contract as the
    non-subsampled sharded pipeline.

    local_* shapes are per-shard; vloc/last_shard give the valid image
    edge at FULL resolution (each channel's valid edge is vloc >> shift).
    Returns (jitted_fn, in_shardings) like build_fused_pipeline_sharded;
    inputs are dense per-channel coeff/lf stacks plus per-channel
    code/mul grids and the full-res sigma block grid."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from ..parallel.sharded import halo_pad_cols, halo_pad_rows

    Hl, Wl = local_full_shape
    by_rows = shard_dim == "rows"
    halo_pad = halo_pad_rows if by_rows else halo_pad_cols

    def _up2_sharded(p, axis_i, vloc_c):
        """Triangle 2x upsample along the SHARDED axis: 1 stored-res halo
        sample from mesh neighbors, clamped at the global/valid edges by
        halo_pad's 1-wide mirror, then slice off the upsampled halo."""
        stacked = p[None]  # halo_pad handles [..., h, w]
        padded = halo_pad(stacked, 1, axis, vloc_c, last_shard)[0]
        up = _triangle_up2(padded, axis_i)
        if axis_i == 0:
            return up[2:-2, :]
        return up[:, 2:-2]

    def pipeline(*args):
        per_chan = [args[4 * c : 4 * c + 4] for c in range(3)]
        sigma_blocks = args[12]
        planes = []
        for c, (coeff, lf_quant, code_grid, mul_grid) in enumerate(per_chan):
            lf_plane = lf_quant.astype(jnp.float32) * np.float32(lf_scale[c])
            q = coeff.astype(jnp.float32)
            qbn = np.float32(quant_bias_numerator)
            qb = np.float32(quant_bias[c])
            safe_q = jnp.where(q == 0.0, 1.0, q)
            biased = jnp.where(jnp.abs(q) <= 1.0, q * qb, q - qbn / safe_q)
            outc = dense_transform_channels(
                biased[None], lf_plane[None], None, None,
                code_grid, mul_grid.astype(jnp.float32),
                entries3[c], {s: np.asarray(m)[None]
                              for s, m in matrices3[c].items()},
                global_scale, (qm_scale[c],),
            )[0]
            # upsample to the full-res local band, HORIZONTAL then
            # VERTICAL in both layouts (the single-device program's
            # order — 2-D triangle roundings do not commute across axis
            # order, and sharded-vs-single bit-identity depends on it);
            # the sharded axis exchanges a 1-sample stored-res halo, the
            # other axis is local (clamp at the band's own edge == the
            # global edge there)
            if by_rows:
                while outc.shape[1] < Wl:
                    outc = _triangle_up2(outc, 1)
                while outc.shape[0] < Hl:
                    vloc_c = vloc // (Hl // outc.shape[0])
                    outc = _up2_sharded(outc, 0, vloc_c)
            else:
                while outc.shape[1] < Wl:
                    vloc_c = vloc // (Wl // outc.shape[1])
                    outc = _up2_sharded(outc, 1, vloc_c)
                while outc.shape[0] < Hl:
                    outc = _triangle_up2(outc, 0)
            planes.append(outc[:Hl, :Wl])
        out = jnp.stack(planes)

        if gabor_weights is not None:
            from .filters import gabor

            padded = halo_pad(out, 1, axis, vloc, last_shard)
            out = jnp.stack([
                gabor(padded[c], tuple(gabor_weights[c]),
                      prepad_rows=1 if by_rows else 0,
                      prepad_cols=0 if by_rows else 1)
                for c in range(3)
            ])
        if epf_params is not None:
            from .filters import epf_step

            sigma = jnp.repeat(
                jnp.repeat(sigma_blocks, 8, 0), 8, 1
            )[:Hl, :Wl]
            cs = tuple(epf_params.channel_scale)
            bsm = float(epf_params.border_sad_mul)

            def pass_(x, step, mult):
                padded = halo_pad(x, 3, axis, vloc, last_shard)
                return epf_step(padded, sigma, step, cs, mult, bsm,
                                prepad_rows=3 if by_rows else 0,
                                prepad_cols=0 if by_rows else 3)

            if epf_params.iters == 3:
                out = pass_(out, 0, float(epf_params.pass0_sigma_scale))
            if epf_params.iters >= 1:
                out = pass_(out, 1, 1.0)
            if epf_params.iters >= 2:
                out = pass_(out, 2, float(epf_params.pass2_sigma_scale))
        return out

    if by_rows:
        spec_p = P(axis, None)
        spec_out = P(None, axis, None)
    else:
        spec_p = P(None, axis)
        spec_out = P(None, None, axis)
    in_specs = [spec_p] * 13
    fn = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=spec_out,
    )
    shardings = tuple(NamedSharding(mesh, s) for s in in_specs)
    if crop is not None:
        inner = fn

        def fn(*args):
            return inner(*args)[:, : crop[0], : crop[1]]

    return jax.jit(fn), shardings


def build_fused_pipeline_1ch(plane_shape, lf_shape, entries, matrices,
                             quant_bias: float, quant_bias_numerator: float,
                             global_scale, qm_scale: float, lf_scale: float):
    """Single-channel fused pipeline for chroma-subsampled frames
    (do_ycbcr with jpeg_upsampling != 0): per-channel plane geometries
    differ, so each channel runs its own dequant -> dense inverse
    transform program (no CfL across channels; filters run after chroma
    upsampling in the render path, image.rs:448-486).

    entries: ((sel, oy, ox), ...); matrices: {sel: [h, w]} this channel.
    fn(coeff [H, W] int, lf_quant [LH, LW], code_grid, mul_grid)
    -> [H, W] f32.
    """
    H, W = plane_shape
    mats3 = {sel: np.asarray(m)[None] for sel, m in matrices.items()}

    def pipeline(coeff, lf_quant, code_grid, mul_grid):
        lf_plane = lf_quant.astype(jnp.float32) * np.float32(lf_scale)
        qbn = np.float32(quant_bias_numerator)
        qb = np.float32(quant_bias)
        q = coeff.astype(jnp.float32)
        safe_q = jnp.where(q == 0.0, 1.0, q)
        biased = jnp.where(jnp.abs(q) <= 1.0, q * qb, q - qbn / safe_q)
        out = dense_transform_channels(
            biased[None], lf_plane[None], None, None,
            code_grid, mul_grid.astype(jnp.float32), entries, mats3,
            global_scale, (qm_scale,),
        )
        return out[0]

    return jax.jit(pipeline)
