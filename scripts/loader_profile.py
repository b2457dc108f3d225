"""Per-stage host-loader cost profile: where does the 8.5 ms/frame go?

VERDICT r4 item 5 asks for per-worker train throughput >= 140 frames/s OR
a measured proof of what the per-core floor is.  This script breaks the
per-frame cost of the native fast path (datasets._native_fast_sample ->
native/host_pipeline.cpp cspn_aug_pack) into stages on the same NYU-shaped
fixtures as scripts/loader_bench.py (480x640 frames, warm page cache):

  - decode:   h5py open + dataset reads + CHW->HWC transpose
  - aug  :    the fused C++ pass, decomposed by toggling stages on the
              SAME inputs -- pack-only (normalize+sparse+pack), +resize,
              +rotate, +jitter, +flip -- so each delta prices one stage
  - python:   everything else in ds[idx] (RNG draws, dict assembly)

Writes result/loader_profile.json with ms/frame per stage and the implied
single-worker ceiling.  Single-threaded, median-of-repeats; run on an idle
host (concurrent compile jobs corrupt the numbers).

Usage: timeout 900 python scripts/loader_profile.py [--frames 64] \
           [--out result/loader_profile.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_ms(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="result/loader_profile.json")
    args = ap.parse_args()

    from scripts.loader_bench import make_fixtures
    from cspn_tpu.data import native
    from cspn_tpu.data.datasets import NyuDepthDataset

    assert native.aug_available(), "native host pipeline not built"

    tmp = tempfile.mkdtemp(prefix="loader_profile_")
    h5_csv, _ = make_fixtures(tmp, args.frames)
    ds = NyuDepthDataset(h5_csv, root_dir=tmp, split="train", n_sample=500)

    idxs = list(range(args.frames))

    # -- stage 1: decode ----------------------------------------------------
    def decode_all():
        for i in idxs:
            ds._load_arrays(i)

    decode_ms = _median_ms(decode_all, args.reps) / args.frames

    # -- stage 2: the fused native pass, stage-by-stage on fixed inputs -----
    arrays = [ds._load_arrays(i) for i in idxs]
    import cspn_tpu.data.transforms as T

    rng = np.random.default_rng(0)
    params = []
    for _ in idxs:
        s = float(rng.uniform(1.0, 1.5))
        h0, w0 = 480, 640
        params.append(
            dict(
                resize_hw=ds._resize_shorter(h0, w0, int(ds.resize_base * s)),
                angle=float(rng.uniform(-5.0, 5.0)),
                jitter=T.ColorJitter.draw_params(0.4, 0.4, 0.4, rng),
                flip=True,
                inv_scale=1.0 / s,
            )
        )

    def run_aug(resize=False, rotate=False, jitter=False, flip=False):
        for (rgb, depth), p in zip(arrays, params):
            native.aug_pack(
                rgb,
                depth,
                resize_hw=p["resize_hw"] if resize else None,
                angle=p["angle"] if rotate else 0.0,
                crop_hw=ds.crop_hw,
                flip=p["flip"] if flip else False,
                jitter=p["jitter"] if jitter else [],
                inv_scale=p["inv_scale"],
                n_sample=ds.n_sample,
                sparse_denom=ds.sparse_denom,
                seed=7,
            )

    ladder = {
        "pack_only": dict(),
        "resize": dict(resize=True),
        "resize_rotate": dict(resize=True, rotate=True),
        "resize_rotate_jitter": dict(resize=True, rotate=True, jitter=True),
        "full_chain": dict(resize=True, rotate=True, jitter=True, flip=True),
    }
    ladder_ms = {
        name: _median_ms(lambda kw=kw: run_aug(**kw), args.reps) / args.frames
        for name, kw in ladder.items()
    }

    # -- end-to-end ds[idx] for the python overhead residual ----------------
    def e2e():
        for i in idxs:
            ds[i]

    e2e_ms = _median_ms(e2e, args.reps) / args.frames

    stages = {
        "decode_h5_ms": round(decode_ms, 3),
        "aug_pack_only_ms": round(ladder_ms["pack_only"], 3),
        "aug_resize_delta_ms": round(ladder_ms["resize"] - ladder_ms["pack_only"], 3),
        "aug_rotate_delta_ms": round(
            ladder_ms["resize_rotate"] - ladder_ms["resize"], 3
        ),
        "aug_jitter_delta_ms": round(
            ladder_ms["resize_rotate_jitter"] - ladder_ms["resize_rotate"], 3
        ),
        "aug_flip_delta_ms": round(
            ladder_ms["full_chain"] - ladder_ms["resize_rotate_jitter"], 3
        ),
        "aug_full_chain_ms": round(ladder_ms["full_chain"], 3),
        "python_residual_ms": round(e2e_ms - decode_ms - ladder_ms["full_chain"], 3),
        "e2e_ms": round(e2e_ms, 3),
    }
    aug_share = ladder_ms["full_chain"] / e2e_ms
    out = {
        "what": (
            "per-stage host cost of one train sample on the native fast path "
            "(480x640 NYU-shaped fixture -> 228x304 rgbd); deltas price one "
            "aug stage each; see docstring"
        ),
        "host_cores": os.cpu_count(),
        "frames": args.frames,
        "stages_ms_per_frame": stages,
        "implied_single_worker_fps": round(1e3 / e2e_ms, 1),
        "dominant": (
            "augmentation" if aug_share > 0.5
            else "decode" if decode_ms / e2e_ms > 0.5
            else "mixed"
        ),
        "aug_share": round(aug_share, 3),
        "decode_share": round(decode_ms / e2e_ms, 3),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
