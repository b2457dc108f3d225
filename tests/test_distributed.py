"""Execute the multi-host init path (un-gating PARITY's last gated row).

Real multi-host needs multiple processes; what CAN be executed on CI:
  - the single-process no-op fast path,
  - an ACTUAL `jax.distributed.initialize` with an n=1 coordinator (run in
    a subprocess so it owns the distributed runtime) followed by a real
    computation and clean shutdown,
  - the coordinator-failure path: unreachable coordinator + short timeout
    must exhaust the retry loop and propagate.
"""

from __future__ import annotations

import socket
import subprocess
import sys
import textwrap

from cspn_tpu.parallel.distributed import host_shard, initialize_multihost


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_single_process_noop():
    # no env, no args: must return without touching the distributed runtime
    initialize_multihost()
    pi, pc = host_shard()
    assert (pi, pc) == (0, 1)


def test_n1_coordinator_initialize_executes():
    """initialize_multihost with an explicit n=1 coordinator actually runs
    jax.distributed.initialize (subprocess owns the runtime)."""
    port = _free_port()
    code = textwrap.dedent(f"""
        import jax
        jax.config.update('jax_platforms', 'cpu')
        from cspn_tpu.parallel.distributed import host_shard, initialize_multihost
        initialize_multihost('127.0.0.1:{port}', num_processes=1, process_id=0,
                             retries=2, retry_delay_s=0.5,
                             initialization_timeout=30)
        assert host_shard() == (0, 1), host_shard()
        import jax.numpy as jnp
        assert float(jnp.sum(jnp.arange(4.0))) == 6.0
        jax.distributed.shutdown()
        print('N1_INIT_OK')
    """)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd="/root/repo",
    )
    assert "N1_INIT_OK" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_unreachable_coordinator_fails_fast():
    """A worker pointing at a dead coordinator must fail in bounded time.

    NB the coordination-service client terminates the process with a FATAL
    log on connect deadline (absl F-log, not a Python exception), so the
    observable contract is: nonzero exit, DEADLINE_EXCEEDED in stderr, and
    well under the 300 s default timeout — i.e. initialize_multihost's
    initialization_timeout knob reached the runtime.  (The retry loop in
    initialize_multihost covers the exception-raising failure modes:
    already-initialized and pre-connect errors.)
    """
    import time

    port = _free_port()  # nothing listens here
    code = textwrap.dedent(f"""
        import jax
        jax.config.update('jax_platforms', 'cpu')
        from cspn_tpu.parallel.distributed import initialize_multihost
        initialize_multihost('127.0.0.1:{port}', num_processes=2,
                             process_id=1, retries=1,
                             initialization_timeout=3)
        print('DID_NOT_FAIL')
    """)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd="/root/repo",
    )
    dt = time.time() - t0
    assert r.returncode != 0, (r.stdout, r.stderr[-1000:])
    assert "DID_NOT_FAIL" not in r.stdout
    assert "DEADLINE_EXCEEDED" in r.stderr, r.stderr[-1000:]
    assert dt < 60, f"failure detection took {dt:.0f}s"
