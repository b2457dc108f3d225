"""Microbench: phase-split subpixel convs vs the production fused form.

The subpixel decoder computes `unpool2x -> 5x5 conv` as ONE half-resolution
SxS=3x3 conv emitting 4 phase groups (decoder.py:_subpixel_weights).  The
phase kernels are zero-padded to the common 3x3 tap grid: the true tap
counts per phase are 3x3 / 3x2 / 2x3 / 2x2 = 25, but the fused conv spends
4*9 = 36 tap-slots -- 44% of its MXU FLOPs multiply structural zeros.  The
eval profile (result/eval_profile.json) shows these twin convs are 52.7 ms
of the 97.6 ms conv time at b128, already at ~190 TFLOP/s bf16, so the only
remaining lever is cutting the zero-slot FLOPs:

  one    production: single (3,3) conv -> 4C            36 slots
  two    py-split:   (3,3) -> 2C  +  (2,3) -> 2C        30 slots (83%)
  four   full split: (3,3)+(3,2)+(2,3)+(2,2) -> C each  25 slots (69%)

Usage: timeout 900 python scripts/subpixel_split_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (h, w, cin, c4) for the four twin-conv stages of the flagship decoder
SHAPES = [
    (8, 10, 2048, 4096),
    (15, 19, 1024, 2048),
    (29, 38, 512, 1024),
    (57, 76, 256, 256),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=24)
    ap.add_argument("--out", default="result/subpixel_split_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w, pad_h, pad_w):
        return lax.conv_general_dilated(
            x, w, (1, 1), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    rng = np.random.default_rng(0)
    rows = []
    for h, w, cin, c4 in SHAPES:
        c = c4 // 4
        x0 = jnp.asarray(rng.standard_normal((args.batch, h, w, cin)), jnp.bfloat16)

        def mk(kh, kw, cout):
            return jnp.asarray(
                rng.standard_normal((kh, kw, cin, cout)) * 0.01, jnp.bfloat16
            )

        variants = {
            "one_3x3_4C": lambda x, ws=(mk(3, 3, c4),): conv(
                x, ws[0], (1, 1), (1, 1)
            ),
            "two_33_23_2C": lambda x, ws=(mk(3, 3, 2 * c), mk(2, 3, 2 * c)): (
                jnp.concatenate(
                    [conv(x, ws[0], (1, 1), (1, 1)), conv(x, ws[1], (0, 1), (1, 1))],
                    axis=-1,
                )
            ),
            "four_split_C": lambda x, ws=(
                mk(3, 3, c), mk(3, 2, c), mk(2, 3, c), mk(2, 2, c)
            ): jnp.concatenate(
                [
                    conv(x, ws[0], (1, 1), (1, 1)),
                    conv(x, ws[1], (1, 1), (0, 1)),
                    conv(x, ws[2], (0, 1), (1, 1)),
                    conv(x, ws[3], (0, 1), (0, 1)),
                ],
                axis=-1,
            ),
        }
        flops_one = 2 * args.batch * h * w * cin * c4 * 9
        rec = {"shape": [args.batch, h, w, cin, c4],
               "flops_one_TF": round(flops_one / 1e12, 3)}
        print(f"[{args.batch},{h},{w},{cin}]->{c4}  one-conv "
              f"{flops_one/1e12:.2f} TFLOP")
        for name, f in variants.items():
            def chained(x, f=f):
                def body(_, x):
                    y = f(x)
                    # couple through a FULL reduction of y: a scalar pick
                    # lets XLA dead-code the op down to one output pixel
                    # (measured >peak "throughput" without this)
                    r = jnp.mean(y.astype(jnp.float32)).astype(x.dtype)
                    return x.at[0, 0, 0, 0].set(
                        x[0, 0, 0, 0] * 0.999 + r * 1e-6
                    )

                return jax.lax.fori_loop(0, args.repeats, body, x)

            cf = jax.jit(chained)
            xi = x0 + jnp.bfloat16(1e-3)
            float(cf(xi)[0, 0, 0, 0])
            times = []
            for _ in range(5):
                xi = xi + jnp.bfloat16(float(rng.uniform(1e-4, 1e-3)))
                t0 = time.time()
                out = cf(xi)
                float(out[0, 0, 0, 0])
                times.append(time.time() - t0)
            ms = float(np.median(times)) / args.repeats * 1e3
            rec[name] = round(ms, 3)
            tf = flops_one / 1e12 / (ms / 1e3)
            print(f"  {name}: {ms:7.3f} ms  ({tf:.0f} TF/s vs one-conv flops)")
        rows.append(rec)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump({"what": "phase-split subpixel conv microbench "
                           "(see docstring)", "results": rows}, fo, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
