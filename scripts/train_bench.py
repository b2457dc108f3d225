"""Flagship train-step throughput probe (ResNet50-UNet + 24-step CSPN).

Times the jitted donated train step (fwd + masked-L1 + bwd + SGD, the hot
loop of reference train.py:190-199) with the state-chained end-sync method
from CLAUDE.md: the TrainState threads through N sequential step calls and
ONE `float()` sync happens at the end, so the tunnel's per-call RPC cost is
amortized and nothing is loop-hoistable (state changes every step, so the
remote execution cache cannot replay).

Usage:  timeout 600 python scripts/train_bench.py [--batch 16] [--chain 16]
        [--trials 5] [--dtype bfloat16] [--height 228] [--width 304]

Prints one JSON line to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--arch", default="resnet50")
    ap.add_argument("--height", type=int, default=228)
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--loss", default="l1")
    ap.add_argument("--momentum-dtype", default=None, choices=["bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cspn_tpu.config import ModelConfig, RunConfig
    from cspn_tpu.train.loop import build_model, make_train_step
    from cspn_tpu.train.state import create_train_state

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = RunConfig(model=ModelConfig(arch=args.arch, dtype=args.dtype))
    model = build_model(cfg, train=True)

    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.height, args.width
    rgbd = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)
    depth = jnp.abs(jnp.asarray(rng.standard_normal((b, h, w)), jnp.float32)) + 0.1

    t0 = time.time()
    state = create_train_state(
        model, jax.random.PRNGKey(0), rgbd[:1], momentum_dtype=args.momentum_dtype
    )
    step = make_train_step(model, args.loss)
    state, loss, _ = step(state, rgbd, depth)  # compile
    float(loss)
    log(f"compile+first step: {time.time() - t0:.1f}s")

    # warm: one full chain (first reps after compile can be wildly slow)
    for _ in range(args.chain):
        state, loss, _ = step(state, rgbd, depth)
    float(loss)

    times = []
    for _ in range(args.trials):
        t0 = time.time()
        for _ in range(args.chain):
            state, loss, _ = step(state, rgbd, depth)
        float(loss)  # single end sync
        times.append((time.time() - t0) / args.chain)
    sec = float(np.median(times))
    fps = b / sec
    log(f"per-step times (ms): {[round(t * 1e3, 2) for t in sorted(times)]}")
    print(
        json.dumps(
            {
                "metric": "nyu_train_frames_per_s",
                "value": round(fps, 1),
                "unit": "frames/s",
                "step_ms": round(sec * 1e3, 2),
                "batch": b,
                "dtype": args.dtype,
                "arch": args.arch,
            }
        )
    )


if __name__ == "__main__":
    main()
