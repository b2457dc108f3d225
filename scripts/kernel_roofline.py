"""Roofline probe for the fused CSPN kernels on the real TPU chip.

BASELINE.json's north star asks the 24-step propagation to run at HBM
speed-of-light: the fused kernel's minimum HBM traffic is ONE read of the
inputs (guidance, blur depth, sparse depth) plus ONE write of the output,
with all 24 steps resident in VMEM.  This script measures per-invocation
kernel time and reports it against two rooflines: the HBM speed-of-light
(traffic bound) and the VPU stencil bound (the 24 in-VMEM steps are
elementwise multiply-add work, not matmuls, so the MXU is idle and the VPU
sets the compute ceiling).

Timing through the device tunnel (CLAUDE.md): the kernel is chained
`reps` times on-device via a dynamic-bound fori_loop (output feeds the next
input), inputs vary per trial (identical executions are cached), the sync
fetches ONE element, and the per-invocation time is the two-point slope
(t(reps_hi) - t(reps_lo)) / (reps_hi - reps_lo), which cancels the ~30 ms
RPC fixed cost exactly (no dispatch overlap exists inside a fori_loop, so
the slope is honest here, unlike across separate train-step dispatches).

Usage:  python scripts/kernel_roofline.py   (needs the TPU; ~2 min)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0  # v5e
REPS_LO, REPS_HI, TRIALS = 16, 144, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure(chained, lead, rest, shape_probe):
    """Median two-point-slope per-invocation seconds for chained(lead, *rest, reps)."""
    import jax.numpy as jnp

    rng = np.random.default_rng()

    def run(reps):
        out = chained(lead + jnp.float32(rng.uniform(1e-7, 1e-6)), *rest, reps)
        float(out.reshape(-1)[0])

    t0 = time.time()
    run(REPS_LO)
    run(REPS_HI)
    log(f"  compile+warm {time.time() - t0:.1f}s")
    slopes = []
    for _ in range(TRIALS):
        t0 = time.time()
        run(REPS_LO)
        t_lo = time.time() - t0
        t0 = time.time()
        run(REPS_HI)
        t_hi = time.time() - t0
        slopes.append((t_hi - t_lo) / (REPS_HI - REPS_LO))
    return float(np.median(slopes))


def probe_2d(n=16, h=228, w=304, steps=24, io_dtype=None):
    import jax
    import jax.numpy as jnp
    from cspn_tpu.ops import cspn2d

    rng = np.random.default_rng()
    g = jnp.asarray(rng.standard_normal((n, h, w, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    s = jnp.asarray(
        (rng.random((n, h, w)) < 0.01) * np.abs(rng.standard_normal((n, h, w))),
        jnp.float32,
    )

    @jax.jit
    def chained(g, b, s, reps):
        def body(_, b):
            y = cspn2d(g, b, s, steps=steps, backend="pallas", io_dtype=io_dtype)
            return b * 0.999 + y * 1e-6

        return jax.lax.fori_loop(0, reps, body, b)

    t = _measure(chained, g, (b, s), "2d")
    px = n * h * w
    io_bytes = 2 if io_dtype is not None else 4
    bytes_min = px * (io_bytes * 10 + 4)  # gates+blur+sparse at io dtype, f32 out
    sol = bytes_min / (HBM_GBPS * 1e9)
    from cspn_tpu.ops.cspn_pallas import fwd_fits_vmem
    return {
        "kernel": "cspn2d_pallas"
                  + ("_bf16io" if io_dtype is not None else "")
                  + ("" if fwd_fits_vmem(h, w, io_bytes) else "(tiled)"),
        "shape": f"{n}x{h}x{w}x8g",
        "steps": steps,
        "us": round(t * 1e6, 1),
        "us_per_frame": round(t / n * 1e6, 2),
        "min_traffic_MB": round(bytes_min / 1e6, 1),
        "hbm_sol_us": round(sol * 1e6, 1),
        "hbm_sol_fraction": round(sol / t, 3),
        "ps_per_px_step": round(t / (px * steps) * 1e12, 1),
    }


def probe_3d(n=1, d=48, h=64, w=128, steps=24):
    import jax
    import jax.numpy as jnp
    from cspn_tpu.ops import cspn_nd

    rng = np.random.default_rng()
    g = jnp.asarray(rng.standard_normal((n, d, h, w, 26)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, d, h, w, 1)), jnp.float32)

    @jax.jit
    def chained(g, f, reps):
        def body(_, f):
            y = cspn_nd(g, f, steps=steps, backend="pallas")
            return f * 0.999 + y * 1e-6

        return jax.lax.fori_loop(0, reps, body, f)

    t = _measure(chained, g, (f,), "3d")
    vx = n * d * h * w
    bytes_min = vx * 4 * (26 + 1 + 1)  # gates + feat + out, f32
    sol = bytes_min / (HBM_GBPS * 1e9)
    return {
        "kernel": "cspn3d_pallas",
        "shape": f"{n}x{d}x{h}x{w}x26g",
        "steps": steps,
        "us": round(t * 1e6, 1),
        "us_per_frame": round(t / n * 1e6, 2),
        "min_traffic_MB": round(bytes_min / 1e6, 1),
        "hbm_sol_us": round(sol * 1e6, 1),
        "hbm_sol_fraction": round(sol / t, 3),
        "ps_per_px_step": round(t / (vx * steps) * 1e12, 1),
    }


def decompose_2d(n, h, w, io_dtype=None, steps_lo=4, steps_hi=24):
    """Split kernel time into fixed cost (DMA in/out + gate normalization +
    invocation overhead) vs per-step VPU compute by timing two step counts:
    t(s) = fixed + s * per_step.  Pins WHERE the low HBM-SoL fraction of
    the large-shape kernels comes from (VERDICT r4 weak #5): a large fixed
    share justifies DMA-overlap scheduling work; a dominant per-step share
    means the kernel sits at the VPU compute floor and the 'HBM SoL'
    metric simply does not credit compute-bound kernels."""
    lo = probe_2d(n=n, h=h, w=w, steps=steps_lo, io_dtype=io_dtype)
    hi = probe_2d(n=n, h=h, w=w, steps=steps_hi, io_dtype=io_dtype)
    per_step = (hi["us"] - lo["us"]) / (steps_hi - steps_lo)
    fixed = lo["us"] - steps_lo * per_step
    total = hi["us"]
    return {
        "kernel": hi["kernel"] + "[decompose]",
        "shape": hi["shape"],
        "steps_pair": [steps_lo, steps_hi],
        "us_lo": lo["us"],
        "us_hi": hi["us"],
        "fixed_us": round(fixed, 1),
        "per_step_us": round(per_step, 2),
        "compute_fraction_at_24": round(
            max(0.0, 1.0 - fixed / max(total, 1e-9)), 3
        ),
        "per_step_ps_per_px": round(per_step * 1e6 / (n * h * w), 1),
    }


def main():
    import json

    import jax

    import functools
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        log("no TPU visible; roofline numbers are only meaningful on TPU")
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rows = []
    for probe in (
        probe_2d,
        functools.partial(probe_2d, io_dtype=jnp.bfloat16),
        # KITTI-double-height frames: f32 routes to the row-tiled kernel,
        # bf16 I/O fits the whole-image kernel (fwd_fits_vmem extension)
        functools.partial(probe_2d, n=2, h=704, w=1216),
        functools.partial(probe_2d, n=2, h=704, w=1216, io_dtype=jnp.bfloat16),
        probe_3d,
        # fixed-vs-per-step decomposition at the large shapes (and the
        # flagship as the reference point)
        functools.partial(decompose_2d, n=16, h=228, w=304),
        functools.partial(decompose_2d, n=2, h=704, w=1216),
        functools.partial(decompose_2d, n=2, h=704, w=1216,
                          io_dtype=jnp.bfloat16),
        # pre-aligned width isolates the XLA lane-pad cost in the tiled
        # fixed term; 352x1216 is the REAL KITTI benchmark frame (routes
        # whole-image at both dtypes)
        functools.partial(decompose_2d, n=2, h=704, w=1280),
        functools.partial(decompose_2d, n=2, h=352, w=1216),
    ):
        rec = probe()
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            for rec in rows:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
