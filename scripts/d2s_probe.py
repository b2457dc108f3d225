"""Microbench: depth-to-space formulations at the flagship decoder shapes.

The eval per-op profile (result/eval_profile.json) shows the subpixel
decoder's depth-to-space relayouts cost ~10.6 ms of the 118 ms b128 eval
step (~9%), running at ~11% of one-pass HBM speed of light: XLA lowers the
px-major reshape+transpose+reshape to two physical relayout passes with a
T(2,128)-tiled intermediate.  A Pallas kernel already measured SLOWER
(ops/d2s_pallas.py docstring).  This probe measures XLA-level
reformulations that were never tried:

  f1  px-major reshape/transpose/reshape     (current production path)
  f2  py-major: channel slice + (W,2C)->(2W,C) minor merge + row stack
  f3  strided scatter: out.at[:, py::2, px::2].set(phase)
  f4  dilated pad + add of the 4 phases
  f6  py-major single transpose (py crosses w only; (px,c) stays minor)

All produce the same bytes moved; the semantic difference (px- vs py-major
phase-channel order) is absorbed by reordering _subpixel_weights' phase
concat, which is free.  Timing: chained fori_loop repeats with a scalar
output->input coupling (identical executions are cached on the tunnel).

Usage: timeout 900 python scripts/d2s_probe.py [--out result/d2s_probe.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (h, w, c4) -> crop (oh, ow); flagship decoder stages at b128 + head
SHAPES = [
    (8, 10, 4096, 15, 19),
    (15, 19, 2048, 29, 38),
    (29, 38, 1024, 57, 76),
    (57, 76, 256, 114, 152),
    (114, 152, 36, 228, 304),
]


def f1_px_major(x, oh, ow):
    n, h, w, c4 = x.shape
    c = c4 // 4
    v = x.reshape(n, h, w, 2, 2, c)  # [..., px, py, c]
    y = v.transpose(0, 1, 4, 2, 3, 5).reshape(n, 2 * h, 2 * w, c)
    return y[:, :oh, :ow, :]


def f2_py_slice_stack(x, oh, ow):
    # channel order (py, px, c): even rows = x[..., :2C], odd = x[..., 2C:]
    n, h, w, c4 = x.shape
    c = c4 // 4
    a = x[..., : 2 * c].reshape(n, h, 2 * w, c)  # (w, px, c) -> (2w, c): minor merge
    b = x[..., 2 * c :].reshape(n, h, 2 * w, c)
    import jax.numpy as jnp

    y = jnp.stack([a, b], axis=2).reshape(n, 2 * h, 2 * w, c)
    return y[:, :oh, :ow, :]


def f3_strided_set(x, oh, ow):
    import jax.numpy as jnp

    n, h, w, c4 = x.shape
    c = c4 // 4
    y = jnp.zeros((n, 2 * h, 2 * w, c), x.dtype)
    for px in range(2):
        for py in range(2):
            g = px * 2 + py
            y = y.at[:, py::2, px::2, :].set(x[..., g * c : (g + 1) * c])
    return y[:, :oh, :ow, :]


def f4_dilated_pad(x, oh, ow):
    import jax.numpy as jnp
    from jax import lax

    n, h, w, c4 = x.shape
    c = c4 // 4
    out = None
    zero = jnp.zeros((), x.dtype)
    for px in range(2):
        for py in range(2):
            g = px * 2 + py
            p = lax.pad(
                x[..., g * c : (g + 1) * c],
                zero,
                ((0, 0, 0), (py, 1 - py, 1), (px, 1 - px, 1), (0, 0, 0)),
            )
            out = p if out is None else out + p
    return out[:, :oh, :ow, :]


def f6_py_major_transpose(x, oh, ow):
    n, h, w, c4 = x.shape
    c = c4 // 4
    v = x.reshape(n, h, w, 2, 2, c)  # [..., py, px, c]
    y = v.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)
    return y[:, :oh, :ow, :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    fns = {
        "f1_px_major(prod)": f1_px_major,
        "f2_py_slice_stack": f2_py_slice_stack,
        "f3_strided_set": f3_strided_set,
        "f4_dilated_pad": f4_dilated_pad,
        "f6_py_major_transpose": f6_py_major_transpose,
    }
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    rows = []
    for h, w, c4, oh, ow in SHAPES:
        x0 = jnp.asarray(
            rng.standard_normal((args.batch, h, w, c4)), dt
        )
        bytes_one_pass = 2 * args.batch * h * w * c4 * dt.itemsize
        print(f"shape [{args.batch},{h},{w},{c4}] {args.dtype} "
              f"(1-pass r+w = {bytes_one_pass/1e6:.0f} MB "
              f"= {bytes_one_pass/819e9*1e6:.0f} us at SoL)")
        rec = {"shape": [args.batch, h, w, c4], "crop": [oh, ow],
               "dtype": args.dtype, "sol_us": round(bytes_one_pass / 819e9 * 1e6, 1)}
        for name, f in fns.items():
            def chained(x, f=f):
                def body(_, x):
                    y = f(x, oh, ow)
                    # couple through a FULL reduction of y (a scalar pick
                    # would let XLA slice the relayout away)
                    r = jnp.mean(y.astype(jnp.float32)).astype(x.dtype)
                    return x.at[0, 0, 0, 0].set(
                        x[0, 0, 0, 0] * 0.999 + r * 1e-6
                    )

                return jax.lax.fori_loop(0, args.repeats, body, x)

            cf = jax.jit(chained)
            xi = x0 + 1e-6
            try:
                float(cf(xi)[0, 0, 0, 0])  # compile + warm
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAILED {type(e).__name__}: {e}")
                rec[name] = None
                continue
            times = []
            for _ in range(5):
                xi = xi + float(rng.uniform(1e-7, 1e-6))
                t0 = time.time()
                out = cf(xi)
                float(out[0, 0, 0, 0])
                times.append(time.time() - t0)
            us = float(np.median(times)) / args.repeats * 1e6
            rec[name] = round(us, 1)
            print(f"  {name}: {us:8.1f} us  ({us / rec['sol_us']:.2f}x SoL)")
        rows.append(rec)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fo:
            json.dump({"what": "depth-to-space formulation microbench "
                               "(see scripts/d2s_probe.py docstring)",
                       "platform": jax.devices()[0].platform,
                       "results": rows}, fo, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
