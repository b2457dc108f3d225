"""Fused Pallas TPU kernel for the 2D CSPN recurrence.

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):

The reference implements one propagation step as 8 zero-padded tensor shifts +
a frozen sum-conv, re-reading the gates from main memory every one of the 24
steps (cspn_pytorch/models/cspn.py:66-82).  On TPU that composition is
HBM-bandwidth bound: ~24 x 12 channel-images of HBM traffic.

Here the *entire* post-process is one kernel invocation per image:
  - load guidance (8 planes), blur depth and sparse depth into VMEM once,
  - compute the shifted, canvas-normalized gates in VMEM
    (gather form of cspn.py:85-144, see ops/neighbors.py),
  - iterate all `steps` stencil updates in VMEM (VPU only, no HBM traffic),
  - write the final depth once.
HBM traffic ~= 1 read of (8+1+1) channels + 1 write of 1 channel -- the
speed-of-light floor for this op.

Cross-lane work is minimized: W is the TPU lane dimension, so +-1 shifts
along W are expensive cross-lane permutes.  The gates are therefore stored
*pre-unshifted* along W (G2_d[i, j] = ghat_d[i, j - dx_d]); each step then
groups the 8 directions into three column groups and needs only TWO lane
shifts total:

    u_dx[i, j] = sum_dy G2_(dy,dx)[i, j] * x[i + dy, j]      (sublane offsets)
    y = u_0 + shift_W(u_+1, +1) + shift_W(u_-1, -1) + (1 - gate_sum) * x0

The depth state lives in an (H+2, W) scratch padded only along H (sublanes),
so the three x[i+dy, :] reads are cheap sublane-offset slices.

Layout: the kernel wants gate *planes* with (H, W) as the tiled trailing dims,
so its guidance input is [N, 8, H, W] (channel-first).  `cspn2d_pallas`
accepts NHWC and transposes once; model code can pass channel_first=True.

Gradients: `cspn2d_pallas` has a custom VJP.  The backward pass currently
rematerializes through the jnp reference implementation (exact same math);
a fused backward kernel is the planned upgrade.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cspn_tpu.ops import cspn_ref

# Reference gate order (see ops/neighbors.py): offsets (dy, dx), gather form.
_OFFS = ((1, 1), (1, 0), (1, -1), (0, 1), (0, -1), (-1, 1), (-1, 0), (-1, -1))
# direction indices grouped by dx
_BY_DX = {
    1: [d for d, (_, dx) in enumerate(_OFFS) if dx == 1],
    0: [d for d, (_, dx) in enumerate(_OFFS) if dx == 0],
    -1: [d for d, (_, dx) in enumerate(_OFFS) if dx == -1],
}


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _shift_w(x: jnp.ndarray, dx: int) -> jnp.ndarray:
    """y[..., j] = x[..., j + dx], zero fill (one cross-lane shift)."""
    if dx == 0:
        return x
    zeros = jnp.zeros(x.shape[:-1] + (abs(dx),), x.dtype)
    if dx > 0:
        return jnp.concatenate([x[..., dx:], zeros], axis=-1)
    return jnp.concatenate([zeros, x[..., :dx]], axis=-1)


def _fwd_kernel(
    guid_ref,  # (1, 8, H, W) VMEM
    blur_ref,  # (1, H, W) VMEM
    sparse_ref,  # (1, H, W) VMEM or None
    out_ref,  # (1, H, W) VMEM
    g2_ref,  # (8, H, W) VMEM scratch: normalized gates, lane-unshifted
    xpad_ref,  # (H+2, W) VMEM scratch: depth state padded along H only
    *,
    steps: int,
    norm_abs: bool,
):
    h, w = out_ref.shape[1], out_ref.shape[2]

    # --- B_d[i, j] = g_d[i + dy_d, j]: sublane shift only ---
    xpad_ref[:] = jnp.zeros_like(xpad_ref)  # reused as padding canvas for gates
    for d, (dy, _) in enumerate(_OFFS):
        g = guid_ref[0, d]
        if norm_abs:
            g = jnp.abs(g)
        xpad_ref[1 : h + 1, :] = g
        g2_ref[d] = xpad_ref[1 + dy : 1 + dy + h, :]

    # --- canvas normalizer A[i,j] = sum_d |B_d[i, j + dx_d]|: 2 lane shifts ---
    col_abs = {
        dx: sum(jnp.abs(g2_ref[d]) for d in ds) for dx, ds in _BY_DX.items()
    }
    denom = col_abs[0] + _shift_w(col_abs[1], 1) + _shift_w(col_abs[-1], -1)
    nonzero = denom > 0.0
    inv = jnp.where(nonzero, 1.0 / jnp.where(nonzero, denom, 1.0), 0.0)
    inv_by_dx = {0: inv, 1: _shift_w(inv, -1), -1: _shift_w(inv, 1)}

    # --- G2_d[i,j] = B_d[i,j] * inv[i, j - dx_d]; gate_sum for center term ---
    col_sum = {}
    for dx, ds in _BY_DX.items():
        acc = None
        for d in ds:
            g2 = g2_ref[d] * inv_by_dx[dx]
            g2_ref[d] = g2
            acc = g2 if acc is None else acc + g2
        col_sum[dx] = acc
    gate_sum = col_sum[0] + _shift_w(col_sum[1], 1) + _shift_w(col_sum[-1], -1)

    # --- propagation: `steps` stencil iterations entirely in VMEM ---
    x0 = blur_ref[0]
    center_x0 = (1.0 - gate_sum) * x0
    if sparse_ref is not None:
        mask = jnp.sign(sparse_ref[0])
        keep_x = 1.0 - mask
        base = keep_x * center_x0 + mask * x0
    else:
        keep_x = None
        base = center_x0
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, :] = x0

    # per-step: 8 FMA planes, 2 lane shifts, 3 sublane-offset reads
    def body(_, carry):
        rows = {dy: xpad_ref[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(g2_ref[d] * rows[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1)
        if keep_x is not None:
            y = keep_x * y + base
        else:
            y = y + base
        xpad_ref[1 : h + 1, :] = y
        return carry

    lax.fori_loop(0, steps, body, 0, unroll=False)
    out_ref[0] = xpad_ref[1 : h + 1, :]


def _fwd_kernel_nosparse(guid_ref, blur_ref, out_ref, g2_ref, xpad_ref, **kw):
    _fwd_kernel(guid_ref, blur_ref, None, out_ref, g2_ref, xpad_ref, **kw)


def _cspn2d_pallas_impl(
    guidance_cf: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None,
    steps: int,
    norm_type: str,
    interpret: bool,
) -> jnp.ndarray:
    n, _, h, w = guidance_cf.shape
    use_sparse = sparse_depth is not None
    kernel = functools.partial(
        _fwd_kernel if use_sparse else _fwd_kernel_nosparse,
        steps=steps,
        norm_abs="abs" in norm_type,
    )
    img_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        img_spec,
    ]
    args = [guidance_cf.astype(jnp.float32), blur_depth.astype(jnp.float32)]
    if use_sparse:
        in_specs.append(img_spec)
        args.append(sparse_depth.astype(jnp.float32))
    flops_step = 8 * 2 * h * w
    return pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        in_specs=in_specs,
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((8, h, w), jnp.float32),
            pltpu.VMEM((h + 2, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * steps * flops_step,
            bytes_accessed=n * (8 + 1 + 1 + 1) * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


# --- custom VJP: pallas forward, reference-rematerialized backward ---------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cspn2d_vjp(guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret):
    return _cspn2d_pallas_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret
    )


def _cspn2d_fwd(guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret):
    out = _cspn2d_pallas_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret
    )
    return out, (guidance_cf, blur_depth, sparse_depth)


def _cspn2d_bwd(steps, norm_type, interpret, residuals, ct):
    guidance_cf, blur_depth, sparse_depth = residuals

    def ref_fn(g_cf, blur):
        g_cl = jnp.moveaxis(g_cf, 1, -1)
        return cspn_ref.cspn2d_reference(
            g_cl, blur, sparse_depth, steps=steps, norm_type=norm_type
        )

    _, vjp = jax.vjp(ref_fn, guidance_cf, blur_depth)
    dg, db = vjp(ct)
    ds = jnp.zeros_like(sparse_depth) if sparse_depth is not None else None
    return dg, db, ds


_cspn2d_vjp.defvjp(_cspn2d_fwd, _cspn2d_bwd)


def cspn2d_pallas(
    guidance,
    blur_depth,
    sparse_depth=None,
    *,
    steps: int = 24,
    norm_type: str = "8sum",
    interpret: bool | None = None,
    channel_first: bool = False,
):
    """Fused 2D CSPN (pytorch reference semantics, cspn.py:42-83).

    Args:
        guidance: [N, H, W, 8] (or [N, 8, H, W] with channel_first=True).
        blur_depth: [N, H, W].
        sparse_depth: optional [N, H, W].
    Returns [N, H, W] float32.
    """
    if interpret is None:
        interpret = _interpret_default()
    g_cf = guidance if channel_first else jnp.moveaxis(guidance, -1, 1)
    return _cspn2d_vjp(g_cf, blur_depth, sparse_depth, steps, norm_type, interpret)


def cspn_nd_pallas(guide, feat, *, kernel_size: int = 3, steps: int = 24):
    """Paddle-semantics nd CSPN. 3D fused kernel is a planned upgrade;
    currently dispatches to the jnp reference (XLA-fused)."""
    return cspn_ref.cspn_nd_reference(guide, feat, kernel_size=kernel_size, steps=steps)
