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
import time

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    *,
    retries: int = 3,
    retry_delay_s: float = 5.0,
    initialization_timeout: int | None = None,
) -> None:
    """Initialize the distributed runtime.  No-ops on single-process runs.

    With no arguments, relies on the cloud-TPU environment auto-detection;
    arguments override for manual setups (coordinator 'host:port', etc.).
    Transient coordinator failures (workers racing the coordinator at job
    start) are retried with linear backoff before the error propagates.
    Executed (n=1 coordinator + failure path) by tests/test_distributed.py.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        # single process (or TPU metadata auto-detect handles it)
        if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
            return
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    last_err: Exception | None = None
    for attempt in range(max(retries, 1)):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
            return
        except (RuntimeError, jax.errors.JaxRuntimeError) as e:
            if "already initialized" in str(e):
                return
            last_err = e
            if attempt + 1 < max(retries, 1):
                time.sleep(retry_delay_s * (attempt + 1))
    raise last_err


def host_shard() -> tuple[int, int]:
    """(process_index, process_count) for per-host input pipeline sharding."""
    return jax.process_index(), jax.process_count()
