"""Per-op device-time rollup for flagship eval (the bench.py headline path).

Usage: timeout 900 python scripts/eval_profile.py [--batch 64] [--top 25]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/eval_trace")
    ap.add_argument("--json-out", default=None,
                    help="write the per-op rollup as a JSON artifact "
                         "(e.g. result/eval_profile.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cspn_tpu.config import ModelConfig, RunConfig
    from cspn_tpu.train.loop import build_model
    from cspn_tpu.utils.precision import cast_floating

    cfg = RunConfig(model=ModelConfig(arch="resnet50", dtype=args.dtype))
    model = build_model(cfg, train=False)
    rng = np.random.default_rng(0)
    b, h, w = args.batch, 228, 304
    x = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)

    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    if args.dtype in ("bfloat16", "bf16", "int8"):
        v = cast_floating(v, jnp.bfloat16)
    if args.dtype == "int8":
        # serving config: weights pre-quantized once at load (the bench.py
        # headline path); only activations quantize per call
        from cspn_tpu.utils.quant import build_weight_qcache

        v = {**v, "qcache": build_weight_qcache(model, v, x[:1])}

    @jax.jit
    def apply(v, x):
        return model.apply(v, x)

    y = apply(v, x)
    y.block_until_ready()
    for i in range(3):
        x = x.at[..., 3].set(x[..., 3] * 0.999)
        y = apply(v, x)
    y.block_until_ready()

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            x = x.at[..., 3].set(x[..., 3] * 0.999)
            y = apply(v, x)
        float(y[0, 0, 0])

    paths = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            names[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    lanes = {k for k, v2 in names.items() if "XLA Ops" in v2}
    by_cat = collections.Counter()
    agg = collections.defaultdict(float)
    meta = {}
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in lanes:
            continue
        a = ev.get("args") or {}
        dur = ev.get("dur", 0) / 1e3
        by_cat[a.get("hlo_category", "?")] += dur
        agg[ev["name"]] += dur
        meta[ev["name"]] = (a.get("hlo_category", "?"), a.get("source", "?"),
                            (a.get("long_name") or "")[:120])
        total += dur
    print(f"total device: {total:.1f} ms / {args.steps} steps = "
          f"{total / args.steps:.2f} ms/step (batch {args.batch})")
    print("\nby hlo_category (ms/step):")
    for cat, ms in by_cat.most_common():
        print(f"  {ms / args.steps:8.2f}  {cat}")
    print(f"\ntop {args.top} ops (ms/step):")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        cat, src, ln = meta[name]
        print(f"  {ms / args.steps:7.3f} {cat:16s} {name[:36]:38s} {src}")
        if ln:
            print(f"          {ln}")

    if args.json_out:
        import jax as _jax

        rec = {
            "what": "flagship eval per-op device-time rollup "
                    "(jax.profiler 'XLA Ops' lane; scripts/eval_profile.py)",
            "platform": _jax.devices()[0].platform,
            "batch": args.batch,
            "dtype": args.dtype,
            "ms_per_step": round(total / args.steps, 3),
            "frames_per_s": round(args.batch / (total / args.steps / 1e3), 1),
            "by_category_ms_per_step": {
                cat: round(ms / args.steps, 3) for cat, ms in by_cat.most_common()
            },
            "top_ops_ms_per_step": [
                {
                    "name": name[:60],
                    "ms": round(ms / args.steps, 3),
                    "category": meta[name][0],
                    "source": meta[name][1],
                    "long_name": meta[name][2],
                }
                for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
            ],
        }
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
