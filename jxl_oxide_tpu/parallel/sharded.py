"""Group-sharded VarDCT decode pipeline over a device mesh.

The image is sharded by rows of 8px blocks across a 1-D "groups" mesh axis
(the reference's per-group thread parallelism, vardct/mod.rs:250-376,
re-expressed as SPMD). Block-local stages (dequant, CfL, IDCT) need no
communication; the restoration filters are stencils, so shard boundaries
exchange halo rows over ICI with lax.ppermute — the halo widths follow the
reference's region padding contract (1px gaborish, 3px EPF,
jxl-frame/src/lib.rs:626-649).

Image-edge boundaries keep their filter semantics (clamp for gaborish,
symmetric mirror for EPF) by mirroring the shard's own rows at the mesh
edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["decode_mesh", "decode_mesh_multihost", "halo_exchange_rows",
           "sharded_vardct_pipeline"]


def decode_mesh(n_devices: int | None = None, axis: str = "groups") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def decode_mesh_multihost(n_hosts: int, chips_per_host: int) -> Mesh:
    """2-D mesh for multi-host decode: the outer 'hosts' axis maps to DCN
    (coarse row bands, LF-group granularity) and the inner 'chips' axis to
    ICI (fine row bands). Halo rows cross DCN only at host-band borders;
    all other exchanges ride ICI (SURVEY 5 distributed-backend mapping).
    On a real v5p slice, pass jax.devices() ordered host-major."""
    devices = np.empty(n_hosts * chips_per_host, dtype=object)
    for i, d in enumerate(jax.devices()[: n_hosts * chips_per_host]):
        devices[i] = d
    return Mesh(
        devices.reshape(n_hosts, chips_per_host),
        axis_names=("hosts", "chips"),
    )


def halo_exchange_rows(local, halo: int, axis, mirror_edges: bool = True):
    """Pad a row-sharded block [..., h_loc, w] with `halo` rows from mesh
    neighbors via ppermute; mesh-edge shards mirror their own rows
    (util.rs:376-386 mirror semantics)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    top_rows = local[..., :halo, :]
    bot_rows = local[..., -halo:, :]
    # receive the neighbor-above's bottom rows / neighbor-below's top rows
    from_above = jax.lax.ppermute(
        bot_rows, axis, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        top_rows, axis, perm=[(i + 1, i) for i in range(n - 1)]
    )
    if mirror_edges:
        mirror_top = top_rows[..., ::-1, :]
        mirror_bot = bot_rows[..., ::-1, :]
        from_above = jnp.where(idx == 0, mirror_top, from_above)
        from_below = jnp.where(idx == n - 1, mirror_bot, from_below)
    return jnp.concatenate([from_above, local, from_below], axis=-2)


def halo_pad_rows(local, halo: int, axis, vloc: int):
    """Pad a row-sharded block [..., h_loc, w] with `halo` real rows from
    mesh neighbors (ppermute over ICI); the global top edge mirrors
    symmetrically, and the global bottom edge mirrors at the static valid
    row count `vloc` of the LAST shard (the image may not fill its final
    shard: plane rows are padded to the shard grid, valid rows end at
    vloc). This reproduces jnp.pad(mode="symmetric") of the full unpadded
    plane exactly, so the sharded filters match the single-device ones
    bit for bit. For halo=1 the mirror row equals the edge row, which is
    also jnp.pad(mode="edge") — the gaborish clamp contract
    (jxl-frame/src/lib.rs:626-649 region padding semantics).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    top = local[..., :halo, :]
    bot = local[..., -halo:, :]
    from_above = jax.lax.ppermute(
        bot, axis, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        top, axis, perm=[(i + 1, i) for i in range(n - 1)]
    )
    from_above = jnp.where(idx == 0, top[..., ::-1, :], from_above)
    padded = jnp.concatenate([from_above, local, from_below], axis=-2)
    # last shard: overwrite rows [vloc, vloc+halo) (in local coords) with
    # the mirror of the last `halo` VALID rows; when vloc == h_loc this
    # replaces the from_below block, otherwise it patches the row-padding
    # region that filters near the valid edge read.
    mirror_bot = local[..., vloc - halo : vloc, :][..., ::-1, :]
    patched = padded.at[..., halo + vloc : halo + vloc + halo, :].set(
        mirror_bot
    )
    return jnp.where(idx == n - 1, patched, padded)


def _gabor_local(plane, weights):
    """Gaborish on a halo-padded plane [h+2, w]; returns [h, w]."""
    w0, w1 = weights
    p = jnp.pad(plane, ((0, 0), (1, 1)), mode="edge")
    c = p[1:-1, 1:-1]
    n = p[:-2, 1:-1]
    s = p[2:, 1:-1]
    w = p[1:-1, :-2]
    e = p[1:-1, 2:]
    total = (
        c
        + (n + s + w + e) * w0
        + (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]) * w1
    )
    return total * (1.0 / (1.0 + 4.0 * w0 + 4.0 * w1))


def sharded_vardct_pipeline(mesh: Mesh, height: int, width: int,
                            gabor_weights=(0.115169525, 0.061248592),
                            epf_params=None):
    """Build the jitted sharded decode step for a DCT8-tiled frame.

    Returns (fn, shardings) where fn(coeff[3,H,W] i32, lf[3,H/8,W/8] f32,
    dmap[3,H,W] f32, kx[H,W], kb[H,W]) -> pixels[3,H,W] f32. H must divide
    evenly across the mesh in units of 8 rows.
    """
    from ..ops.dct import dct_basis_inverse

    axis = (
        mesh.axis_names[0] if len(mesh.axis_names) == 1 else mesh.axis_names
    )
    n = mesh.devices.size
    assert height % (8 * n) == 0, (height, n)
    b8 = dct_basis_inverse(8)

    def local_step(coeff, lf, dmap, kx, kb):
        # [3, h_loc, w] block-local stages
        h_loc, w = coeff.shape[1], coeff.shape[2]
        bh, bw = h_loc // 8, w // 8
        q = coeff.astype(jnp.float32)
        safe = jnp.where(q == 0.0, 1.0, q)
        biased = jnp.where(jnp.abs(q) <= 1.0, q * 0.1, q - 0.145 / safe)
        c = biased * dmap
        c = c.at[0].add(kx * c[1])
        c = c.at[2].add(kb * c[1])
        blocks = c.reshape(3, bh, 8, bw, 8).transpose(0, 1, 3, 2, 4)
        blocks = blocks.at[:, :, :, 0, 0].set(lf)
        ib = jnp.asarray(b8)
        pix = jnp.einsum("yk,cnmkl,xl->cnmyx", ib, blocks, ib,
                         preferred_element_type=jnp.float32)
        pix = pix.transpose(0, 1, 3, 2, 4).reshape(3, h_loc, w)

        # gaborish: 1px halo over ICI (P7 halo contract)
        padded = halo_exchange_rows(pix, 1, axis)
        out = jnp.stack([
            _gabor_local(padded[ch], gabor_weights) for ch in range(3)
        ])

        if epf_params is not None:
            # EPF needs a 3px stencil halo across up to 3 passes; use an
            # 8-row halo so the border_sad_mul y%8 pattern stays aligned,
            # then crop. Edge shards mirror = the reference's symmetric
            # region padding (frame/lib.rs:626-649 contract).
            from ..ops.filters import apply_epf

            ext = halo_exchange_rows(out, 8, axis)
            sigma_loc = jnp.full(
                (h_loc, w), np.float32(epf_params.sigma_for_modular)
            )
            sig_ext = halo_exchange_rows(sigma_loc[None], 8, axis)[0]
            filtered = apply_epf(list(ext), sig_ext, epf_params)
            out = jnp.stack(list(filtered))[:, 8:-8, :]
        return out

    spec3 = P(None, axis, None)
    spec_lf = P(None, axis, None)
    spec2 = P(axis, None)
    # NOTE on collectives: with a tuple axis, ppermute flattens
    # ('hosts', 'chips') row-major, so only shard-border transfers that
    # cross a host boundary use DCN; interior ones stay on ICI.
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec3, spec_lf, spec3, spec2, spec2),
        out_specs=spec3,
    )
    shardings = tuple(
        NamedSharding(mesh, s) for s in (spec3, spec_lf, spec3, spec2, spec2)
    )
    return jax.jit(fn), shardings
