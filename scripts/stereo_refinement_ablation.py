"""Stereo CSPN-refinement ablation: does 3D CSPN improve EPE / D1?

Trains the PSMNet stereo model twice on the same synthetic data and seeds —
once with the 3D-CSPN cost-volume refinement, once without — and records
final val EPE / >3px / D1 for both.  This demonstrates, with a committed
artifact, the accuracy value of the refinement capability the reference
documents but never released (cspn_paddle/README.md:104-151,
--stereoType=cspn vs psmnet).

Usage:  timeout 1200 python scripts/stereo_refinement_ablation.py \
            [--epochs 8] [--out result/stereo_refinement.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--max-disp", type=int, default=32)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--prop-step", type=int, default=12)
    ap.add_argument("--train-size", type=int, default=64)
    ap.add_argument("--style", default="edges", choices=["smooth", "edges"],
                    help="synthetic disparity style; 'edges' has the sharp "
                         "depth discontinuities CSPN refinement exploits")
    ap.add_argument("--out", default="result/stereo_refinement.json")
    args = ap.parse_args()

    import jax

    from cspn_tpu.data import DataLoader
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.train.stereo_loop import StereoConfig, StereoTrainer

    results = {}
    for use_cspn in (False, True):
        tag = "cspn" if use_cspn else "no_cspn"
        cfg = StereoConfig(
            max_disp=args.max_disp,
            features=args.features,
            cspn_steps=args.prop_step,
            use_cspn=use_cspn,
            num_epochs=args.epochs,
            batch_size=4,
            save_dir=f"/tmp/stereo_ablation_{tag}",
        )
        train_ds = SyntheticStereoDataset(
            length=args.train_size, hw=(args.height, args.width),
            max_disp=cfg.max_disp, seed=0, style=args.style,
        )
        val_ds = SyntheticStereoDataset(
            length=16, hw=(args.height, args.width), max_disp=cfg.max_disp,
            seed=1, style=args.style,
        )
        trainer = StereoTrainer(
            cfg,
            DataLoader(train_ds, cfg.batch_size, shuffle=True, drop_last=True),
            DataLoader(val_ds, cfg.batch_size),
        )
        final = trainer.fit()
        results[tag] = {k: round(v, 4) for k, v in final.items()}
        print(f"{tag}: {results[tag]}", flush=True)

    rec = {
        "what": "PSMNet stereo with vs without 3D-CSPN cost-volume refinement "
                "(same synthetic data/seeds/epochs; capability artifact for "
                "cspn_paddle/README.md:104-151)",
        "platform": jax.devices()[0].platform,
        "config": {
            "style": args.style,
            "hw": [args.height, args.width],
            "max_disp": args.max_disp,
            "features": args.features,
            "cspn_steps": args.prop_step,
            "epochs": args.epochs,
            "train_frames": args.train_size,
        },
        "no_cspn": results["no_cspn"],
        "cspn": results["cspn"],
        "epe_improvement": round(
            results["no_cspn"]["EPE"] - results["cspn"]["EPE"], 4
        ),
        "d1_improvement": round(
            results["no_cspn"]["D1"] - results["cspn"]["D1"], 4
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
