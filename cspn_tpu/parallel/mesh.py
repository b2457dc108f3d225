"""Device mesh & sharding helpers.

The reference's device story is CUDA_VISIBLE_DEVICES + DataParallel with a
single-GPU assert (train.py:162-166).  Here scaling is expressed over a
`jax.sharding.Mesh` with two axes:
  'data'    -- batch (data parallel; gradient all-reduce inserted by XLA),
  'spatial' -- image rows (spatially-sharded propagation, see halo.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // spatial
    n = data * spatial
    assert n <= len(devices), f"mesh {data}x{spatial} needs {n} devices"
    arr = np.array(devices[:n]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis of every leaf over the 'data' mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh (params, train state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
