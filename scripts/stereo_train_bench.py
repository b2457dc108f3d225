"""Stereo TRAIN-step throughput on the real TPU (fwd+bwd+SGD, donated state).

PSMNet protocol shape (256x512, D=192, batch 4), timed as state-chained
donated steps with a single end sync (CLAUDE.md tunnel rules: identical
executions are cached, so each timed rep threads the updated state and a
perturbed input into the next step).

Usage: timeout 900 python scripts/stereo_train_bench.py [--dtype bfloat16]
Prints one JSON line per dtype.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN, TRIALS = 8, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(dtype, batch=4, h=256, w=512, max_disp=192, steps=24):
    import jax
    import jax.numpy as jnp

    from cspn_tpu.train.state import TrainState, make_optimizer
    from cspn_tpu.train.stereo_loop import (
        StereoConfig,
        build_stereo_model,
        make_stereo_train_step,
    )

    cfg = StereoConfig(max_disp=max_disp, features=32, cspn_steps=steps,
                       dtype=dtype, batch_size=batch)
    model = build_stereo_model(cfg, train=True)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        rng.uniform(0, max_disp - 1, (batch, h, w)), jnp.float32
    )

    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left[:1], right[:1])
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg.lr, momentum=0.9, weight_decay=1e-4, nesterov=False),
    )
    step = make_stereo_train_step(model, float(max_disp))
    log(f"  init {time.time() - t0:.1f}s")

    def chain(state, seed):
        loss = None
        for i in range(CHAIN):
            state, loss, _ = step(
                state, left * (1.0 + seed + 1e-5 * i), right, disp
            )
        float(loss)  # single end sync
        return state

    t0 = time.time()
    state = chain(state, 1e-6)
    log(f"  compile+warm {time.time() - t0:.1f}s")
    state = chain(state, 2e-6)  # second warm chain (first post-compile reps
    # on the tunnel can be wildly slow)
    times = []
    for t in range(TRIALS):
        t0 = time.time()
        state = chain(state, float(np.random.default_rng(t).uniform(1e-6, 1e-5)))
        times.append((time.time() - t0) / CHAIN)
    ms = float(np.median(times)) * 1e3
    return {
        "metric": "stereo_train_step",
        "dtype": dtype,
        "shape": f"{batch}x{h}x{w}, D={max_disp}, cspn_steps={steps}",
        "ms_per_step": round(ms, 2),
        "frames_per_s": round(batch / ms * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    args = ap.parse_args()
    for dtype in [args.dtype] if args.dtype else ["float32", "bfloat16"]:
        print(json.dumps(bench(dtype)), flush=True)


if __name__ == "__main__":
    main()
