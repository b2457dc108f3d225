"""Per-op device-time rollup for the flagship train step.

Runs a few chained train steps under jax.profiler.trace and rolls up the
'XLA Ops' lane by hlo_category (CLAUDE.md: the trace works through the
tunnel and gives true per-op device times).

Usage: timeout 900 python scripts/train_profile.py [--batch 16] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/train_trace")
    ap.add_argument("--artifact", default=None,
                    help="write a JSON rollup artifact to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cspn_tpu.config import ModelConfig, RunConfig
    from cspn_tpu.train.loop import build_model, make_train_step
    from cspn_tpu.train.state import create_train_state

    cfg = RunConfig(model=ModelConfig(arch="resnet50", dtype=args.dtype))
    model = build_model(cfg, train=True)
    rng = np.random.default_rng(0)
    b, h, w = args.batch, 228, 304
    rgbd = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)
    depth = jnp.abs(jnp.asarray(rng.standard_normal((b, h, w)), jnp.float32)) + 0.1

    state = create_train_state(model, jax.random.PRNGKey(0), rgbd[:1])
    step = make_train_step(model)
    state, loss, _ = step(state, rgbd, depth)
    float(loss)
    for _ in range(4):  # warm
        state, loss, _ = step(state, rgbd, depth)
    float(loss)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, loss, _ = step(state, rgbd, depth)
        float(loss)

    paths = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # find the 'XLA Ops' lane pids/tids
    names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            names[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    xla_lanes = {k for k, v in names.items() if "XLA Ops" in v}

    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in xla_lanes:
            continue
        dur = ev.get("dur", 0) / 1e3  # ms
        cat = (ev.get("args") or {}).get("hlo_category", "?")
        by_cat[cat] += dur
        by_op[ev["name"][:70]] += dur
        total += dur

    per_step = total / args.steps
    print(f"total device time: {total:.1f} ms over {args.steps} steps "
          f"= {per_step:.1f} ms/step (batch {b})")
    print("\nby hlo_category (ms/step):")
    for cat, ms in by_cat.most_common():
        print(f"  {ms / args.steps:8.2f}  {cat}")
    print(f"\ntop {args.top} ops (ms/step):")
    for op, ms in by_op.most_common(args.top):
        print(f"  {ms / args.steps:8.3f}  {op}")

    if args.artifact:
        rec = {
            "what": "flagship train-step per-op device-time rollup "
                    "(ResNet50-UNet + 24-step CSPN, fused bwd kernel)",
            "batch": b,
            "hw": [h, w],
            "dtype": args.dtype,
            "ms_per_step": round(per_step, 2),
            "frames_per_s": round(b / per_step * 1e3, 1),
            "by_category_ms": {
                c: round(ms / args.steps, 2) for c, ms in by_cat.most_common()
            },
            "top_ops_ms": {
                op: round(ms / args.steps, 3)
                for op, ms in by_op.most_common(args.top)
            },
        }
        with open(args.artifact, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
