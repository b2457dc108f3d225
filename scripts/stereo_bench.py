"""Model-level stereo throughput on the real TPU chip (BASELINE config 5).

PSMNetCSPN at the PSMNet crop protocol (256x512, max_disp 192 => a
48x64x128 quarter-resolution cost volume, the paddle demo shape), measured
with and without the 3D-CSPN refinement so the refinement's model-level
cost is explicit.  Timing follows the tunnel rules (CLAUDE.md): on-device
chaining with a dynamic-bound fori_loop, per-trial input jitter,
single-element sync, two-point repeat slope.

Usage:  python scripts/stereo_bench.py   (needs the TPU; ~3 min)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS_LO, REPS_HI, TRIALS = 2, 10, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(use_cspn: bool, batch=4, h=256, w=512, max_disp=192, steps=24,
          dtype="float32"):
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models.stereo import PSMNetCSPN

    model = PSMNetCSPN(
        max_disp=max_disp, features=32, cspn_steps=steps, use_cspn=use_cspn,
        dtype=jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None,
    )
    rng = np.random.default_rng()
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
    jax.block_until_ready(variables)
    log(f"  init {time.time() - t0:.1f}s")

    @jax.jit
    def chained(v, left, right, reps):
        def body(_, left):
            disp = model.apply(v, left, right)  # [N, H, W]
            return left + disp[..., None] * 1e-9

        return jax.lax.fori_loop(0, reps, body, left)

    def run(reps):
        out = chained(
            variables, left + jnp.float32(rng.uniform(1e-7, 1e-6)), right, reps
        )
        float(out.reshape(-1)[0])

    t0 = time.time()
    run(REPS_LO)
    run(REPS_HI)
    log(f"  compile+warm {time.time() - t0:.1f}s")
    slopes = []
    for _ in range(TRIALS):
        t0 = time.time()
        run(REPS_LO)
        t_lo = time.time() - t0
        t0 = time.time()
        run(REPS_HI)
        t_hi = time.time() - t0
        slopes.append((t_hi - t_lo) / (REPS_HI - REPS_LO))
    t = float(np.median(slopes))
    return {
        "model": "PSMNetCSPN" if use_cspn else "PSMNet (no CSPN)",
        "shape": f"{batch}x{h}x{w}, D={max_disp}",
        "dtype": dtype,
        "cspn_steps": steps if use_cspn else 0,
        "ms_per_batch": round(t * 1e3, 2),
        "frames_per_s": round(batch / t, 1),
    }


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="bench one dtype only (default: both)")
    args = ap.parse_args()
    if jax.devices()[0].platform != "tpu":
        log("no TPU visible; numbers are only meaningful on TPU")
    dtypes = [args.dtype] if args.dtype else ["float32", "bfloat16"]
    for dtype in dtypes:
        for use_cspn in (True, False):
            print(json.dumps(bench(use_cspn, dtype=dtype)), flush=True)


if __name__ == "__main__":
    main()
