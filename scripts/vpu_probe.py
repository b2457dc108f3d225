"""VPU throughput microprobe: is bf16 elementwise FMA faster than f32?

Times a Pallas kernel whose loop body is structurally IDENTICAL to the fused
CSPN kernel's propagation step (8 plane FMAs against three different sublane
row offsets + 2 lane shifts + padded-state write), in f32 vs bf16 gate/state
dtypes.  Each FMA uses a distinct row slice so the compiler cannot factor the
gate sum.  Two-point slope over the iteration count cancels invocation
overhead.  Informs the bf16-resident CSPN kernel design (VERDICT r1 item 2).

Usage: python scripts/vpu_probe.py   (real TPU, ~2 min)
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 512
TRIALS = 7
_OFFS = ((1, 1), (1, 0), (1, -1), (0, 1), (0, -1), (-1, 1), (-1, 0), (-1, -1))
_BY_DX = {
    1: [d for d, (_, dx) in enumerate(_OFFS) if dx == 1],
    0: [d for d, (_, dx) in enumerate(_OFFS) if dx == 0],
    -1: [d for d, (_, dx) in enumerate(_OFFS) if dx == -1],
}


def _shift_w(x, dx):
    if dx == 0:
        return x
    zeros = jnp.zeros(x.shape[:-1] + (abs(dx),), x.dtype)
    if dx > 0:
        return jnp.concatenate([x[..., dx:], zeros], axis=-1)
    return jnp.concatenate([zeros, x[..., :dx]], axis=-1)


def make_probe(gate_dtype, state_dtype):
    def kernel(g_ref, x_ref, o_ref, xpad_ref, *, iters):
        h = H
        xpad_ref[:] = jnp.zeros_like(xpad_ref)
        xpad_ref[1 : h + 1, :] = x_ref[:]

        def body(_, c):
            rows = {dy: xpad_ref[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
            u = {
                dx: sum(
                    (g_ref[d].astype(state_dtype) if gate_dtype != state_dtype
                     else g_ref[d]) * rows[_OFFS[d][0]]
                    for d in ds
                )
                for dx, ds in _BY_DX.items()
            }
            y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1)
            xpad_ref[1 : h + 1, :] = y * 0.124  # keep magnitudes bounded
            return c

        lax.fori_loop(0, iters, body, 0, unroll=False)
        o_ref[:] = xpad_ref[1 : h + 1, :]

    @functools.partial(jax.jit, static_argnums=2)
    def run(g, x, iters):
        return pl.pallas_call(
            functools.partial(kernel, iters=int(iters)),
            out_shape=jax.ShapeDtypeStruct((H, W), state_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((H + 2, W), state_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(g, x)

    return run


def measure(gate_dtype, state_dtype, it_lo=8192, it_hi=65536):
    # ms-scale spread: the tunnel's RPC noise is ~ms, so (hi-lo)*per_iter
    # must be tens of ms for the slope to be meaningful
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.uniform(0.9, 1.1, (8, H, W)), gate_dtype)
    run = make_probe(gate_dtype, state_dtype)

    def go(iters):
        x = jnp.asarray(rng.uniform(0.5, 1.5, (H, W)), state_dtype)
        float(run(g, x, iters).reshape(-1)[0])

    for _ in range(3):  # warm both compiles + flush slow first executions
        go(it_lo)
        go(it_hi)
    slopes = []
    for _ in range(TRIALS):
        t0 = time.time(); go(it_lo); t_lo = time.time() - t0
        t0 = time.time(); go(it_hi); t_hi = time.time() - t0
        slopes.append((t_hi - t_lo) / (it_hi - it_lo))
    per_iter = float(np.median(slopes))
    ops = 19 * H * W  # 8 mul + 7 add + 2 shifts + 2 scale (per px per iter)
    return {
        "gate_dtype": np.dtype(gate_dtype).name,
        "state_dtype": np.dtype(state_dtype).name,
        "ns_per_iter": round(per_iter * 1e9, 1),
        "ps_per_px_iter": round(per_iter / (H * W) * 1e12, 2),
        "Tops_per_s": round(ops / per_iter / 1e12, 2),
    }


def main():
    assert jax.devices()[0].platform == "tpu", "needs the TPU"
    for gd, sd in (
        (jnp.float32, jnp.float32),
        (jnp.bfloat16, jnp.float32),   # bf16 gates upcast at use
        (jnp.bfloat16, jnp.bfloat16),  # fully bf16 step
    ):
        print(json.dumps(measure(gd, sd)), flush=True)


if __name__ == "__main__":
    main()
