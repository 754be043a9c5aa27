"""Multi-chip decode parallelism: meshes, halo exchange, sharded pipeline.

The reference is single-host shared-memory (rayon, SURVEY.md §2.5); the TPU
equivalent shards the pixel grid across a device mesh and exchanges tile
halos over ICI (SURVEY.md §2.16 P1/P7). See sharded.py.
"""

from .sharded import decode_mesh, halo_exchange_rows, sharded_vardct_pipeline

__all__ = ["decode_mesh", "halo_exchange_rows", "sharded_vardct_pipeline"]
