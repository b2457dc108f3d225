"""Parallelism (SURVEY.md §2.6): device mesh, data-parallel sharding, and
spatially-sharded CSPN with halo exchange over ICI."""

from cspn_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from cspn_tpu.parallel.halo import cspn2d_spatial, cspn_nd_spatial

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "cspn2d_spatial",
    "cspn_nd_spatial",
]
