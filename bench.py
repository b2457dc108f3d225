"""Benchmark entry point (driver contract).

Measures flagship-model eval throughput -- ResNet50-UNet + 24-step CSPN on
NYU geometry (228x304) -- on the available accelerator, with the CSPN
post-process running (a) as the fused Pallas kernel and (b) as the
XLA-composed reference (the TPU equivalent of the reference's offset+conv
composition, cspn_pytorch/models/cspn.py).

Prints ONE JSON line:
  metric      nyu_eval_frames_per_s (full model, frames/s on this chip)
  vs_baseline speedup of the Pallas path over the XLA-composed path
              (the reference publishes no throughput numbers; BASELINE.md
              says establish fresh + report the fused-kernel gain)
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed_call(fwd, variables, x, rng, iters):
    """Median wall time of fully-forced calls on run-unique inputs.

    The runtime tunnel caches repeated identical executions and its
    block_until_ready is optimistic, so every call uses a fresh input value
    (perturbed on-device) and completion is forced by fetching a scalar.
    """
    times = []
    xi = x + float(rng.uniform(1e-7, 1e-6))
    float(fwd(variables, xi)[0, 0, 0])  # warm
    for _ in range(iters):
        xi = xi + float(rng.uniform(1e-7, 1e-6))
        t0 = time.time()
        out = fwd(variables, xi)
        float(out[0, 0, 0])
        times.append(time.time() - t0)
    return float(np.median(times))


def bench_model(b_small=8, b_large=32, iters=12, steps=24):
    """Per-backend frames/s via the two-batch slope method:
    fps = (b_large - b_small) / (t_large - t_small), which cancels the
    fixed per-call RPC overhead of the device tunnel."""
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models import cspn_unet_resnet50

    rng = np.random.default_rng()  # OS entropy: unique values per run
    xs = jnp.asarray(rng.standard_normal((b_small, 228, 304, 4)), jnp.float32)
    xl = jnp.asarray(rng.standard_normal((b_large, 228, 304, 4)), jnp.float32)

    results = {}
    variables = None
    for backend in ("pallas", "reference"):
        if jax.devices()[0].platform != "tpu" and backend == "pallas":
            backend_eff = "reference"  # no TPU: measure reference twice
        else:
            backend_eff = backend
        model = cspn_unet_resnet50(cspn_backend=backend_eff)
        if variables is None:
            t0 = time.time()
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), xs[:1])
            jax.block_until_ready(variables)
            log(f"init: {time.time() - t0:.1f}s")
        fwd = jax.jit(lambda v, x, m=model: m.apply(v, x))
        t_small = _timed_call(fwd, variables, xs, rng, iters)
        t_large = _timed_call(fwd, variables, xl, rng, iters)
        dt = max(t_large - t_small, 1e-6)
        fps = (b_large - b_small) / dt
        results[backend] = fps
        log(
            f"{backend}: b{b_small}={t_small * 1e3:.1f}ms b{b_large}="
            f"{t_large * 1e3:.1f}ms -> {fps:.1f} frames/s (slope)"
        )
    return results


def main():
    results = bench_model()
    fps = results["pallas"]
    ratio = results["pallas"] / max(results["reference"], 1e-9)
    print(
        json.dumps(
            {
                "metric": "nyu_eval_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s/chip (ResNet50-UNet + 24-step CSPN, 228x304)",
                "vs_baseline": round(ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
