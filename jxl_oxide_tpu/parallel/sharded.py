"""Group-sharded VarDCT decode over a device mesh: meshes + halo padding.

The image shards by bands of whole 256px groups across a 1-D "groups" mesh
axis (the reference's per-group thread parallelism, vardct/mod.rs:250-376,
re-expressed as SPMD) — rows of groups for tall frames, columns of groups
for wide ones. Block-local stages (dequant, CfL, IDCT) need no
communication; the restoration filters are stencils, so shard boundaries
exchange halo rows/columns over ICI with lax.ppermute — the halo widths
follow the reference's region padding contract (1px gaborish, 3px EPF,
jxl-frame/src/lib.rs:626-649).

Frames whose group count does not divide the mesh are padded up to the
next mesh multiple (trailing shards carry only padding); the shard that
contains the valid image edge mirrors its own rows there so the sharded
filters reproduce the single-device symmetric padding bit for bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

__all__ = ["decode_mesh", "decode_mesh_multihost", "halo_pad_rows",
           "halo_pad_cols"]


def decode_mesh(n_devices: int | None = None, axis: str = "groups") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def decode_mesh_multihost(n_hosts: int, chips_per_host: int) -> Mesh:
    """2-D mesh for multi-host decode: the outer 'hosts' axis maps to DCN
    (coarse bands, LF-group granularity) and the inner 'chips' axis to
    ICI (fine bands). Halo rows cross DCN only at host-band borders;
    all other exchanges ride ICI (SURVEY 5 distributed-backend mapping).
    On a real v5p slice, pass jax.devices() ordered host-major."""
    devices = np.empty(n_hosts * chips_per_host, dtype=object)
    for i, d in enumerate(jax.devices()[: n_hosts * chips_per_host]):
        devices[i] = d
    return Mesh(
        devices.reshape(n_hosts, chips_per_host),
        axis_names=("hosts", "chips"),
    )


def halo_pad_rows(local, halo: int, axis, vloc: int, last_shard: int):
    """Pad a row-sharded block [..., h_loc, w] with `halo` real rows from
    mesh neighbors (ppermute over ICI); the global top edge mirrors
    symmetrically, and the global bottom edge mirrors at the static valid
    row count `vloc` of shard `last_shard` (the image may not fill the
    shard grid: bands are padded to n_shards * h_loc, the valid rows end
    at local row vloc of shard last_shard, and any later shard carries
    only padding). This reproduces jnp.pad(mode="symmetric") of the full
    unpadded plane exactly, so the sharded filters match the
    single-device ones bit for bit. For halo=1 the mirror row equals the
    edge row, which is also jnp.pad(mode="edge") — the gaborish clamp
    contract (jxl-frame/src/lib.rs:626-649 region padding semantics).
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
    # the shard holding the valid edge: overwrite rows [vloc, vloc+halo)
    # (in local coords) with the mirror of the last `halo` VALID rows;
    # when vloc == h_loc this replaces the from_below block, otherwise it
    # patches the padding region that filters near the valid edge read.
    mirror_bot = local[..., vloc - halo : vloc, :][..., ::-1, :]
    patched = padded.at[..., halo + vloc : halo + vloc + halo, :].set(
        mirror_bot
    )
    return jnp.where(idx == last_shard, patched, padded)


def halo_pad_cols(local, halo: int, axis, vloc: int, last_shard: int):
    """Column-sharded analog of halo_pad_rows: pad [..., h, w_loc] with
    `halo` real columns from mesh neighbors; the global left edge mirrors
    symmetrically and the valid right edge (column vloc of shard
    last_shard) mirrors the last valid columns."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    left = local[..., :halo]
    right = local[..., -halo:]
    from_left = jax.lax.ppermute(
        right, axis, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left, axis, perm=[(i + 1, i) for i in range(n - 1)]
    )
    from_left = jnp.where(idx == 0, left[..., ::-1], from_left)
    padded = jnp.concatenate([from_left, local, from_right], axis=-1)
    mirror_right = local[..., vloc - halo : vloc][..., ::-1]
    patched = padded.at[..., halo + vloc : halo + vloc + halo].set(
        mirror_right
    )
    return jnp.where(idx == last_shard, patched, padded)
