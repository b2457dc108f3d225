"""Depth-completion CSPN ablation: does the 2D CSPN post-process improve
completion metrics over the no-CSPN baseline when trained?

This is the completion analog of scripts/stereo_refinement_ablation.py and
the reference's core accuracy claim (cspn_pytorch/README.md:73-79: the CSPN
rows beat the plain-UNet baselines the missing `torch_resnet` provided).
No NYU/KITTI data exists in this environment, so the arms train on the
synthetic 'edges' fixture: sharp-edged objects whose RGB shows *where*
depth jumps but not *by how much* -- absolute depth is only recoverable
from the sparse channel, so dense completion must spread the sparse
anchors inside edge-bounded regions, exactly the structure CSPN's
edge-aware propagation exploits.

Protocol (reference train.py:286-289): every arm trains END-TO-END from
scratch with the reference recipe (SGD+nesterov, lr .01, masked L1,
plateau-on-MAE) on identical data; arms differ ONLY in the post-process:
    no_cspn   -- plain UNet baseline (the missing `torch_resnet`)
    cspn      -- 24-step CSPN, norm '8sum'      (non-pos affinity row)
    cspn_abs  -- 24-step CSPN, norm '8sum_abs'  (pos affinity row)
Multi-seed with paired per-seed deltas (reference 5-run-averaging standard,
cspn_pytorch/README.md:73).

Monocular variant (BASELINE config 4, the nyu_mono preset): pass
`--style edges_mono --n-sample 0` -- RGB then encodes depth (no sparse
channel needed) and the ablation asks whether CSPN re-sharpens the
discontinuities the coarse-to-fine decoder blurs (the TPAMI mono claim);
artifact result/mono_refinement.json.

Usage:  timeout 3600 python scripts/completion_refinement_ablation.py \
            [--seeds 5] [--epochs 10] [--cpu] [--small] \
            [--style edges|edges_mono|smooth] [--n-sample N] \
            [--out result/completion_refinement.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPORT_KEYS = ("RMSE", "MAE", "ABS_REL", "DELTA1.02", "DELTA1.05", "DELTA1.10")


def paired_deltas(per_seed: dict, keys=REPORT_KEYS) -> dict:
    """Per-seed paired improvements of each arm vs no_cspn: positive =
    better (errors go down, DELTA thresholds go up); ddof=1 sample std
    (5 seeds is a small sample) with n reported.  Shared by this script
    and scripts/merge_ablation_artifacts.py -- one copy of the
    statistical contract."""
    import numpy as np

    paired = {}
    for arm, rs in per_seed.items():
        if arm == "no_cspn" or not rs:
            continue
        paired[arm] = {}
        for k in keys:
            sgn = -1.0 if k.startswith("DELTA") else 1.0
            d = [sgn * (per_seed["no_cspn"][i][k] - rs[i][k])
                 for i in range(len(rs))]
            std = float(np.std(d, ddof=1)) if len(d) > 1 else 0.0
            paired[arm][k] = {"mean": round(float(np.mean(d)), 4),
                              "std": round(std, 4), "n": len(d)}
    return paired


class _Cached:
    """Materialize a deterministic dataset once (samples are ~1.4 MB each)."""

    def __init__(self, ds):
        self.samples = [ds[i] for i in range(len(ds))]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

ARMS = {
    "no_cspn": dict(use_cspn=False),
    "cspn": dict(use_cspn=True, cspn_norm_type="8sum"),
    "cspn_abs": dict(use_cspn=True, cspn_norm_type="8sum_abs"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed-base", type=int, default=0,
                    help="first seed index (resume a timed-out sweep; merge "
                         "the per_seed lists of the partial artifacts)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--arch", default="resnet18",
                    help="reference KITTI trunk (train.py:146-147)")
    ap.add_argument("--height", type=int, default=228)
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--prop-step", type=int, default=24)
    ap.add_argument("--n-sample", type=int, default=500,
                    help="0 = monocular (nyu_mono preset, BASELINE config 4)")
    ap.add_argument("--style", default="edges",
                    choices=["smooth", "edges", "edges_mono"],
                    help="'edges' for completion (RGB does not encode "
                         "absolute depth); 'edges_mono' for the monocular "
                         "ablation (RGB encodes depth, no sparse anchors)")
    ap.add_argument("--train-size", type=int, default=96)
    ap.add_argument("--val-size", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="tiny geometry smoke config (CI/CPU)")
    ap.add_argument("--out", default="result/completion_refinement.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (ambient JAX_PLATFORMS "
                         "overrides a prefixed env var, use this flag)")
    args = ap.parse_args()
    if args.small:
        args.height, args.width = 64, 96
        args.prop_step = 12
        args.train_size, args.val_size = 32, 16
        args.batch_size = 4

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cspn_tpu.config import DataConfig, ModelConfig, OptimConfig, RunConfig
    from cspn_tpu.data import DataLoader
    from cspn_tpu.data.datasets import SyntheticDepthDataset
    from cspn_tpu.train.loop import Trainer

    def run_arm(tag: str, seed: int) -> dict:
        cfg = RunConfig(
            model=ModelConfig(
                arch=args.arch, cspn_steps=args.prop_step, **ARMS[tag]
            ),
            data=DataConfig(dataset="synthetic", n_sample=args.n_sample,
                            batch_size_train=args.batch_size),
            optim=OptimConfig(num_epochs=args.epochs),
            save_dir=f"/tmp/completion_ablation_"
                     f"{os.path.basename(args.out).split('.')[0]}_{tag}_s{seed}",
            log_every=1000,
        )
        # cache the (deterministic) samples in RAM: regenerating the numpy
        # fixtures every epoch would make the 2-core host the bottleneck
        train_ds = _Cached(SyntheticDepthDataset(
            length=args.train_size, hw=(args.height, args.width),
            n_sample=args.n_sample, seed=100 * seed, style=args.style,
        ))
        val_ds = _Cached(SyntheticDepthDataset(
            length=args.val_size, hw=(args.height, args.width),
            n_sample=args.n_sample, seed=100 * seed + 1, style=args.style,
        ))
        trainer = Trainer(
            cfg,
            DataLoader(train_ds, args.batch_size, shuffle=True, drop_last=True),
            DataLoader(val_ds, min(args.batch_size, args.val_size)),
        )
        # ablation runs don't need checkpoints (15 fits x epochs x 60 MB)
        trainer.ckpt.save_epoch = lambda *a, **k: None
        trainer.ckpt.save_best = lambda *a, **k: None
        # report the BEST epoch's val metrics (the reference selects its
        # released model by best val RMSE, train.py:269-280)
        best = None
        for epoch in range(args.epochs):
            trainer.train_epoch(epoch)
            val = trainer.validate(epoch)
            if best is None or val["RMSE"] < best["RMSE"]:
                best = {k: val[k] for k in REPORT_KEYS}
        shutil.rmtree(cfg.save_dir, ignore_errors=True)
        return {k: round(float(v), 4) for k, v in best.items()}

    per_seed = {arm: [] for arm in ARMS}
    for seed in range(args.seed_base, args.seed_base + args.seeds):
        for arm in ARMS:
            r = run_arm(arm, seed)
            per_seed[arm].append(r)
            print(f"seed {seed} {arm}: {r}", flush=True)
        _write(args, per_seed, seed - args.seed_base + 1)
    _write(args, per_seed, args.seeds)


def _write(args, per_seed, n_seeds):
    import jax

    means = {
        arm: {k: round(sum(r[k] for r in rs) / len(rs), 4) for k in rs[0]}
        for arm, rs in per_seed.items()
        if rs
    }
    print(f"means over {n_seeds} seed(s): {means}", flush=True)
    paired = paired_deltas(per_seed)

    rec = {
        "what": "depth completion: train UNet +- 2D CSPN post-process from "
                "scratch on synthetic 'edges' data (reference protocol "
                "train.py:286-289; core claim cspn_pytorch/README.md:73-79)",
        "platform": jax.devices()[0].platform,
        "config": {
            "arch": args.arch,
            "hw": [args.height, args.width],
            "cspn_steps": args.prop_step,
            "n_sample": args.n_sample,
            "epochs": args.epochs,
            "train_frames": args.train_size,
            "val_frames": args.val_size,
            "batch_size": args.batch_size,
            "seeds": n_seeds,
            "style": args.style,
        },
        "paired_improvement_vs_no_cspn": paired,
        "means": means,
        "per_seed": per_seed,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("paired_improvement_vs_no_cspn", "means")}), flush=True)


if __name__ == "__main__":
    main()
