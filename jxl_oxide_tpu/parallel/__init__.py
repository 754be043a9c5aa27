"""Multi-chip decode parallelism: meshes, halo exchange, sharded pipeline.

The reference is single-host shared-memory (rayon, SURVEY.md 2.5); the TPU
equivalent re-expresses each of its parallelism axes (SURVEY.md 2.16):

- P1/P2 (group/LF-group data parallelism): host-side, one thread per TOC
  section (render/frame.py, render/vardct.py); device-side, the pixel grid
  shards across a mesh (sharded.py).
- P3 (frame pipelining): decodes of independent images/frames overlap --
  the host entropy stage of one runs while device work and transfers of
  others are in flight (jax async dispatch; see bench.py's pipelined
  throughput). Within one animation, frames are sequential by blending
  dependency, as in the reference's handle graph.
- P4 (channel parallelism): vmapped/stacked channel axes in the fused
  pipeline (ops/vardct_pipeline.py).
- P5 (SIMD): XLA VPU/MXU vectorization + hand-written Pallas kernels
  (ops/pallas/).
- P6 (progressive passes): sequential on-device accumulation.
- P7 (halo exchange): 1px gaborish / 3px EPF halos travel over ICI via
  lax.ppermute (halo_pad_rows / halo_pad_cols); the 2-D hosts x chips
  mesh keeps most exchanges on ICI, crossing DCN only at host-band
  borders.
"""

import contextlib as _contextlib
import contextvars as _contextvars

from .sharded import (
    decode_mesh,
    decode_mesh_multihost,
    halo_pad_cols,
    halo_pad_rows,
)

# Active decode mesh: when set, VarDCT frames route through the sharded
# fused pipeline (ops/vardct_pipeline.build_fused_pipeline_sharded) —
# the real decoder program under shard_map, not a synthetic stand-in.
_decode_mesh: _contextvars.ContextVar = _contextvars.ContextVar(
    "jxl_decode_mesh", default=None
)


def set_decode_mesh(mesh) -> None:
    """Set (or clear, with None) the process-wide decode mesh."""
    _decode_mesh.set(mesh)


def get_decode_mesh():
    return _decode_mesh.get()


@_contextlib.contextmanager
def use_decode_mesh(mesh):
    token = _decode_mesh.set(mesh)
    try:
        yield
    finally:
        _decode_mesh.reset(token)


def mesh_fingerprint(mesh) -> tuple:
    """Hashable identity of a mesh for pipeline-cache keys."""
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


__all__ = [
    "decode_mesh",
    "decode_mesh_multihost",
    "halo_pad_cols",
    "halo_pad_rows",
    "set_decode_mesh",
    "get_decode_mesh",
    "use_decode_mesh",
    "mesh_fingerprint",
]
