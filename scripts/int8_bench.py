"""int8 serving benchmark + accuracy-delta artifact.

Two measurements, one JSON artifact (result/int8_eval.json):

1. Flagship eval throughput (ResNet50-UNet + 24-step CSPN, 228x304, b128)
   bf16 vs int8 serving (dynamic quantization, utils/quant.py).  The v5e
   MXU runs s8xs8->s32 at 2x the bf16 rate; eval is conv-compute-bound
   (README), so this is the serving ceiling lever.
2. Metric deltas on a TRAINED model: the synthetic_smoke checkpoint
   (result/synthetic_smoke, resnet18, 64x96) evaluated with the reference
   5-run protocol in bf16 and int8 — the serving-quality gate for the
   quantized path (RMSE/REL/delta1.02 deltas).

Timing uses the chained-repeat method (bench.py): identical executions are
cached by the tunnel, so the output feeds the next input and there is ONE
host sync per chain.

Usage: timeout 1800 python scripts/int8_bench.py [--batch 128] [--skip-fps]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _make_repeated, _timed_repeat, log  # noqa: E402


def bench_fps(batch: int, repeats: int = 8) -> dict:
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models import cspn_unet_resnet50
    from cspn_tpu.utils.precision import cast_floating

    rng = np.random.default_rng()
    x = jnp.asarray(rng.standard_normal((batch, 228, 304, 4)), jnp.float32)
    results = {}
    variables = None
    for mode in ("bf16", "int8", "int8_static"):
        model = cspn_unet_resnet50(
            cspn_backend="auto",
            dtype=jnp.bfloat16,
            quant=mode != "bf16",
        )
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
            jax.block_until_ready(variables)
        v = cast_floating(variables, jnp.bfloat16)
        if mode != "bf16":
            # serving config: weights pre-quantized once at load
            from cspn_tpu.utils.quant import build_act_calibration, build_weight_qcache

            v = {**v, "qcache": build_weight_qcache(model, v, x[:1])}
            if mode == "int8_static":
                # load-time activation-scale calibration (one sample batch)
                v = {**v, "acal": build_act_calibration(model, v, [x[:32]])}
        fn = _make_repeated(model, v, repeats)
        t = _timed_repeat(fn, v, x, rng, repeats)
        results[mode] = batch / t
        log(f"{mode}: {t * 1e3:.2f} ms/batch{batch} -> {results[mode]:.1f} frames/s")
    return results


def metric_deltas(runs: int = 5) -> dict:
    """Paired 5-run synthetic eval of the trained smoke checkpoint.

    run_eval seeds the sparse sampler per run index, so run k of every
    variant sees the SAME sparse points: deltas are paired, and the
    artifact reports mean +- std of the per-run paired deltas (the honest
    uncertainty; inverse-depth metrics are dominated by few near-zero-depth
    pixels and swing between runs).  Variants: bf16; int8 with the default
    exclusion (last decoder block); int8 everywhere (the r2 iRMSE-regression
    configuration, kept as the ablation record)."""
    import dataclasses

    from cspn_tpu.config import PRESETS
    from cspn_tpu.train.evaluate import run_eval

    base = PRESETS["synthetic_smoke"]
    variants = {
        "bfloat16": ("bfloat16", ("gud_up_proj_layer4",), False),
        "int8": ("int8", ("gud_up_proj_layer4",), False),
        "int8_static": ("int8", ("gud_up_proj_layer4",), True),
        "int8_all": ("int8", (), False),
    }
    out = {}
    per_run = {}
    for name, (mode, excl, act_static) in variants.items():
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, dtype=mode,
                                      quant_exclude=excl,
                                      act_static=act_static),
        )
        r = run_eval(cfg, runs=runs)
        out[name] = {k: round(float(v), 5) for k, v in r["mean"].items()}
        per_run[name] = r["runs"]
        log(f"{name}: {out[name]}")
    deltas = {}
    import numpy as _np

    for name in ("int8", "int8_static", "int8_all"):
        d = {}
        for k in out["bfloat16"]:
            pair = [per_run[name][i][k] - per_run["bfloat16"][i][k]
                    for i in range(runs)]
            d[k] = {"mean": round(float(_np.mean(pair)), 5),
                    "std": round(float(_np.std(pair)), 5)}
        deltas[name] = d
    out["paired_deltas_vs_bf16"] = deltas
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip-fps", action="store_true")
    ap.add_argument("--skip-metrics", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (NB `env JAX_PLATFORMS=cpu` "
                         "is silently ignored under the ambient axon env)")
    ap.add_argument("--out", default="result/int8_eval.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rec = {
        "what": "int8 serving (dynamic + static activation scales) vs bf16: "
                "flagship eval throughput + metric deltas on the trained "
                "synthetic_smoke checkpoint (serving-quality gate for "
                "utils/quant.py)",
        "platform": jax.devices()[0].platform,
    }
    if not args.skip_fps:
        t0 = time.time()
        fps = bench_fps(args.batch)
        rec["flagship_b%d" % args.batch] = {
            "bf16_frames_per_s": round(fps["bf16"], 1),
            "int8_frames_per_s": round(fps["int8"], 1),
            "int8_static_frames_per_s": round(fps["int8_static"], 1),
            "speedup": round(fps["int8"] / fps["bf16"], 3),
            "speedup_static": round(fps["int8_static"] / fps["bf16"], 3),
        }
        log(f"fps bench took {time.time() - t0:.0f}s")
    if not args.skip_metrics:
        rec["synthetic_smoke_eval"] = metric_deltas()
        bf, q = rec["synthetic_smoke_eval"]["bfloat16"], rec["synthetic_smoke_eval"]["int8"]
        rec["rmse_delta"] = round(q["RMSE"] - bf["RMSE"], 5)
        rec["irmse_delta"] = round(q["iRMSE"] - bf["iRMSE"], 5)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
