"""On-chip timing of the fused halo-segment backward (VERDICT r3 item 3).

The spatially-sharded CSPN backward runs per-chip as ceil(steps/K) fused
halo-segment adjoints (ops/cspn_pallas.py:_halo_seg_bwd_kernel).  This
bench times, on the real TPU, one segment's backward in both forms --
fused in-VMEM replay vs composed-XLA remat -- at the per-chip shard shapes
the halo path exists for (flagship 228x304 and KITTI-benchmark 352x1216,
split over spatial=2), plus the single-device 24-step whole-image kernel
backward as the parity yardstick: per-chip sharded backward time should be
~(K-segments x halo-extended rows)/(steps x rows) of the unsharded one
(0.54x at flagship, spatial=2, K=4), NOT the ~7x composed penalty.

Timing follows the CLAUDE.md chained-repeat method: grads feed the next
iteration's input inside one jitted fori_loop, one float() sync at the
end, medians over trials.

Usage: timeout 1800 python scripts/halo_bwd_bench.py [--out result/halo_bwd_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chained_seg_grad(seg_fn, repeats):
    import jax
    import jax.numpy as jnp

    def loss(g, b, k, x):
        # full-reduction coupling (CLAUDE.md microbench DCE trap)
        return jnp.mean(seg_fn(g, b, k, x) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))

    def chained(g, b, k, x):
        def body(_, x):
            dg, db, dk, dx = grad(g, b, k, x)
            # every cotangent feeds the carry so none is dead code
            return x + 1e-6 * dx + 1e-9 * (
                jnp.mean(dg) + jnp.mean(db) + jnp.mean(dk)
            )

        return jax.lax.fori_loop(0, repeats, body, x)

    return jax.jit(chained)


def _chained_full_grad(steps, repeats):
    import jax
    import jax.numpy as jnp

    from cspn_tpu.ops import cspn2d

    def loss(g, b, s):
        out = cspn2d(g, b, s, steps=steps, backend="pallas")
        return jnp.mean(out**2)

    grad = jax.grad(loss, argnums=(0, 1))

    def chained(g, b, s):
        def body(_, b):
            dg, db = grad(g, b, s)
            return b + 1e-6 * db + 1e-9 * jnp.mean(dg)

        return jax.lax.fori_loop(0, repeats, body, b)

    return jax.jit(chained)


def _time(fn, args, repeats, trials=5, perturb=None):
    """Chained-repeat timing (CLAUDE.md): perturb one input per trial to
    defeat the tunnel's identical-execution cache; ONE sync at the end."""
    import jax

    if perturb is None:
        perturb = len(args) - 1
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    times = []
    for t in range(trials):
        args = tuple(
            a + 1e-7 * (t + 1) if i == perturb else a
            for i, a in enumerate(args)
        )
        t0 = time.time()
        out = fn(*args)
        float(out.ravel()[0])
        times.append(time.time() - t0)
    return float(np.median(times)) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="result/halo_bwd_bench.json")
    ap.add_argument("--repeats", type=int, default=16)
    ap.add_argument("--k-steps", type=int, default=4)
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cspn_tpu.ops import cspn_pallas as cp

    from cspn_tpu.parallel.halo import choose_halo

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    shapes = [
        # (tag, batch, full_h, w, spatial): per-chip shard = full_h/spatial + 2k halo
        ("flagship_228x304_sp2", 16, 228, 304, 2),
        ("kitti_352x1216_sp2", 4, 352, 1216, 2),
    ]
    rows = []
    for tag, n, fh, w, sp in shapes:
        ext = fh // sp
        chosen = choose_halo(args.steps, ext, w, n)
        # the cost model picks LARGE K at these shard sizes (per-segment
        # gate reload + launch dominate; docs/SCALING.md cost model 2), so
        # sweep K including the chosen point instead of assuming one
        for k in sorted({2, 4, 8, args.steps} | {chosen}):
            k = min(k, ext - 1, args.steps)
            he = ext + 2 * k
            g = jnp.asarray(rng.uniform(-0.12, 0.12, (n, 8, he, w)), jnp.float32)
            base = jnp.asarray(rng.standard_normal((n, he, w)) * 0.1, jnp.float32)
            keep = jnp.asarray(rng.random((n, he, w)) > 0.01, jnp.float32)
            x = jnp.asarray(rng.standard_normal((n, he, w)), jnp.float32)

            fits = cp.halo_bwd_fits_vmem(he, w, k)
            fused = _chained_seg_grad(
                lambda g, b, kk, xx, k=k: cp.cspn2d_halo_segment(
                    g, b, kk, xx, k, interpret=False
                ),
                args.repeats,
            )
            composed = _chained_seg_grad(
                lambda g, b, kk, xx, k=k: cp._halo_segment_ref(g, b, kk, xx, k),
                args.repeats,
            )
            t_fused = _time(fused, (g, base, keep, x), args.repeats)
            t_comp = _time(composed, (g, base, keep, x), args.repeats)
            segs = -(-args.steps // k)
            rec = {
                "shape": tag,
                "batch": n,
                "local_rows": ext,
                "halo_rows": he,
                "w": w,
                "k_steps": k,
                "chosen_by_cost_model": k == chosen,
                "segments_per_24_steps": segs,
                "bwd_fits_vmem": bool(fits),
                "fused_seg_bwd_ms": round(t_fused * 1e3, 3),
                "composed_seg_bwd_ms": round(t_comp * 1e3, 3),
                "composed_over_fused": round(t_comp / t_fused, 2),
                "sharded_bwd_per_chip_ms": round(segs * t_fused * 1e3, 3),
            }
            rows.append(rec)
            print(rec, flush=True)

    # unsharded yardstick at flagship geometry (24-step whole-image kernel)
    n, fh, w = 16, 228, 304
    g = jnp.asarray(rng.uniform(-1, 1, (n, fh, w, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, fh, w)) * 0.1, jnp.float32)
    s = jnp.asarray((rng.random((n, fh, w)) < 0.007) * 2.0, jnp.float32)
    full = _chained_full_grad(args.steps, args.repeats)
    t_full = _time(full, (g, b, s), args.repeats, perturb=1)
    fl = min(
        (r for r in rows if r["shape"] == "flagship_228x304_sp2"),
        key=lambda r: r["sharded_bwd_per_chip_ms"],
    )
    work_ratio = (fl["k_steps"] * fl["segments_per_24_steps"] * fl["halo_rows"]) / (
        args.steps * fh
    )
    rec = {
        "what": "fused vs composed halo-segment backward on-chip; sharded "
                "per-chip backward vs the single-device 24-step kernel "
                "(VERDICT r3 item 3 'done' criterion)",
        "platform": platform,
        "steps": args.steps,
        "segments": rows,
        "flagship_best": fl,
        "unsharded_full_bwd_ms": round(t_full * 1e3, 3),
        "flagship_sharded_over_unsharded": round(
            fl["sharded_bwd_per_chip_ms"] / (t_full * 1e3), 3
        ),
        "flagship_work_ratio_expected": round(work_ratio, 3),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
