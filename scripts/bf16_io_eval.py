"""Metric-delta artifact for the bf16 HBM-I/O CSPN kernel variant.

The io_dtype=bfloat16 kernel computes the exact f32 function of
bf16-ROUNDED gates/blur/sparse inputs (ops/cspn_pallas.py docstring;
pinned bit-level in tests/test_cspn_pallas.py), so its accuracy effect is
fully captured by evaluating with the inputs rounded -- which the
reference backend emulates identically on CPU.  Paired 5-run eval of the
trained synthetic_smoke checkpoint (same sparse-sample seeds per run),
f32 I/O vs bf16 I/O, mean +- std of the per-run paired deltas.

Usage: timeout 1200 python scripts/bf16_io_eval.py [--runs 5] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (`env JAX_PLATFORMS=cpu` is ignored "
                         "under the ambient axon env)")
    ap.add_argument("--out", default="result/bf16_io_eval.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cspn_tpu.config import PRESETS
    from cspn_tpu.train.evaluate import run_eval

    base = PRESETS["synthetic_smoke"]
    per_run = {}
    means = {}
    for name, io in (("f32_io", None), ("bf16_io", "bfloat16")):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, cspn_io_dtype=io)
        )
        r = run_eval(cfg, runs=args.runs)
        per_run[name] = r["runs"]
        means[name] = {k: round(float(v), 5) for k, v in r["mean"].items()}
        print(name, means[name], flush=True)

    deltas = {}
    for k in means["f32_io"]:
        pair = [per_run["bf16_io"][i][k] - per_run["f32_io"][i][k]
                for i in range(args.runs)]
        deltas[k] = {"mean": round(float(np.mean(pair)), 6),
                     "std": round(float(np.std(pair)), 6)}
    rec = {
        "what": "bf16 HBM-I/O CSPN kernel variant: paired metric deltas on "
                "the trained synthetic_smoke checkpoint (see docstring)",
        "platform": jax.devices()[0].platform,
        "runs": args.runs,
        "means": means,
        "paired_deltas_bf16io_vs_f32io": deltas,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
