"""Multi-host runtime (SURVEY.md §2.6 / §5).

The reference is single-process CUDA (train.py:162-166).  Here multi-host
runs use the standard JAX SPMD model: one process per host, each seeing its
local devices, with `jax.distributed.initialize` wiring the coordinator and
`host_shard()` giving the per-host slice for input pipelines
(data/loader.py's `shard=` argument).  Collectives ride ICI within a slice
and DCN across hosts, inserted by XLA from the mesh shardings.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the distributed runtime.  No-ops on single-process runs.

    With no arguments, relies on the cloud-TPU environment auto-detection;
    arguments override for manual setups (coordinator 'host:port', etc.).
    """
    if num_processes in (None, 1) and coordinator_address is None:
        # single process (or TPU metadata auto-detect handles it)
        if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard() -> tuple[int, int]:
    """(process_index, process_count) for per-host input pipeline sharding."""
    return jax.process_index(), jax.process_count()
