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


def _make_repeated(model, variables, repeats):
    """jit-compiled chain of `repeats` model applications whose output feeds
    back into the next input, so per-call device time is measured with the
    host round-trip amortized 1/repeats and nothing loop-hoistable."""
    import jax
    import jax.numpy as jnp

    def chained(v, x):
        def body(_, x):
            y = model.apply(v, x)  # [N, H, W]
            # couple the output back into the sparse channel (cheap, fused)
            return x.at[..., 3].set(x[..., 3] * 0.999 + y * 1e-6)

        return jax.lax.fori_loop(0, repeats, body, x)

    return jax.jit(chained)


def _timed_repeat(fn, variables, x, rng, repeats, trials=5):
    times = []
    xi = x + float(rng.uniform(1e-7, 1e-6))
    float(fn(variables, xi)[0, 0, 0, 0])  # compile + warm
    for _ in range(trials):
        xi = xi + float(rng.uniform(1e-7, 1e-6))
        t0 = time.time()
        out = fn(variables, xi)
        float(out[0, 0, 0, 0])
        times.append(time.time() - t0)
    return float(np.median(times)) / repeats


def bench_model(batch=128, repeats=8, steps=24):
    """Per-backend frames/s via on-device repetition (robust to the device
    tunnel's per-call RPC overhead and execution caching).

    'reference' = the naive translation of the reference to XLA: plain
    unpool-then-conv decoder, composed CSPN, f32 weights (the reference
    runs f32 on GPU).  'pallas' = the TPU-native serving config: sub-pixel
    decoder + fused CSPN kernel + bf16-resident weights/activations (the
    CSPN post-process stays f32).  Identical math/param layout.
    """
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models import cspn_unet_resnet50
    from cspn_tpu.utils.precision import cast_floating

    rng = np.random.default_rng()  # OS entropy: unique values per run
    x = jnp.asarray(rng.standard_normal((batch, 228, 304, 4)), jnp.float32)

    results = {}
    variables = None
    for backend in ("pallas", "reference"):
        if jax.devices()[0].platform != "tpu" and backend == "pallas":
            backend_eff = "reference"  # no TPU: measure reference twice
        else:
            backend_eff = backend
        tpu_native = backend == "pallas"
        model = cspn_unet_resnet50(
            cspn_backend=backend_eff,
            subpixel=tpu_native,
            dtype=jnp.bfloat16 if tpu_native else None,
        )
        if variables is None:
            t0 = time.time()
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
            jax.block_until_ready(variables)
            log(f"init: {time.time() - t0:.1f}s")
        v = cast_floating(variables, jnp.bfloat16) if tpu_native else variables
        fn = _make_repeated(model, v, repeats)
        t = _timed_repeat(fn, v, x, rng, repeats)
        fps = batch / t
        results[backend] = fps
        log(f"{backend}: {t * 1e3:.2f} ms/batch{batch} -> {fps:.1f} frames/s")
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
                "unit": "frames/s/chip (ResNet50-UNet + 24-step CSPN, 228x304, b128)",
                "vs_baseline": round(ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
