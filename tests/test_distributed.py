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


def test_two_process_localhost_psum():
    """REAL multi-process handshake: two processes, one coordinator, a
    cross-process collective (process_allgather = all-gather over the
    loopback DCN path), and clean shutdown — the code path that single-
    process tests only compile (SURVEY.md §2.6 comm-backend row)."""
    import pytest

    import os

    import pytest as _pytest

    _pytest.importorskip("jax.experimental.multihost_utils")
    port = _free_port()
    # one local CPU device per process (the pytest env's 8-virtual-device
    # XLA flag would otherwise be inherited)
    env = dict(
        os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=1"
    )
    code = textwrap.dedent(f"""
        import sys
        import jax
        jax.config.update('jax_platforms', 'cpu')
        pid = int(sys.argv[1])
        from cspn_tpu.parallel.distributed import host_shard, initialize_multihost
        initialize_multihost('127.0.0.1:{port}', num_processes=2,
                             process_id=pid, retries=2, retry_delay_s=1.0,
                             initialization_timeout=60)
        assert host_shard() == (pid, 2), host_shard()
        assert len(jax.devices()) == 2, jax.devices()
        assert len(jax.local_devices()) == 1, jax.local_devices()
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        got = multihost_utils.process_allgather(jnp.array([10.0 + pid]))
        assert got.tolist() == [[10.0], [11.0]], got
        jax.distributed.shutdown()
        print(f'P{{pid}}_PSUM_OK')
    """)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo", env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, (pid, out, err[-2000:])
        assert f"P{pid}_PSUM_OK" in out, (pid, out, err[-2000:])


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
