"""Fused Pallas TPU kernel for the 2D CSPN recurrence.

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):

The reference implements one propagation step as 8 zero-padded tensor shifts +
a frozen sum-conv, re-reading the gates from main memory every one of the 24
steps (cspn_pytorch/models/cspn.py:66-82).  On TPU that composition is
HBM-bandwidth bound: ~24 x 10 channel-images of traffic.

Here the *entire* post-process is one kernel invocation per image:
  - load guidance (8 planes), blur depth and sparse depth into VMEM once,
  - compute the shifted, canvas-normalized gates in VMEM
    (gather form of cspn.py:85-144, see ops/neighbors.py),
  - iterate all `steps` stencil updates in VMEM (VPU only, no HBM traffic),
  - write the final depth once.
HBM traffic ~= 1 read of (8+1+1) channels + 1 write of 1 channel -- the
speed-of-light floor for this op.

Layout: the kernel wants gate *planes* with (H, W) as the tiled trailing dims,
so its guidance input is [N, 8, H, W] (channel-first).  `cspn2d_pallas`
accepts that layout directly; model code transposes its NHWC affinity head
output once before calling.

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
from cspn_tpu.ops.neighbors import OFFSETS_2D_REFERENCE


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _fwd_kernel(
    guid_ref,  # (1, 8, H, W) VMEM
    blur_ref,  # (1, H, W) VMEM
    sparse_ref,  # (1, H, W) VMEM or None (absent when use_sparse=False)
    out_ref,  # (1, H, W) VMEM
    gates_ref,  # (8, H, W) VMEM scratch: normalized shifted gates
    pad_ref,  # (H+2, W+2) VMEM scratch: shared zero-padded canvas
    *,
    steps: int,
    norm_abs: bool,
):
    h, w = out_ref.shape[1], out_ref.shape[2]

    # --- normalized, pre-shifted gates (gather form of cspn.py:85-144) ---
    pad_ref[:] = jnp.zeros_like(pad_ref)
    denom = jnp.zeros((h, w), jnp.float32)
    for d, (dy, dx) in enumerate(OFFSETS_2D_REFERENCE):
        g = guid_ref[0, d]
        if norm_abs:
            g = jnp.abs(g)
        pad_ref[1 : h + 1, 1 : w + 1] = g
        shifted = pad_ref[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        gates_ref[d] = shifted
        denom = denom + jnp.abs(shifted)

    nonzero = denom > 0.0
    inv = 1.0 / jnp.where(nonzero, denom, 1.0)
    gate_sum = jnp.zeros((h, w), jnp.float32)
    for d in range(8):
        gd = jnp.where(nonzero, gates_ref[d] * inv, 0.0)
        gates_ref[d] = gd
        gate_sum = gate_sum + gd

    # --- propagation: `steps` stencil iterations entirely in VMEM ---
    x0 = blur_ref[0]
    center_x0 = (1.0 - gate_sum) * x0
    if sparse_ref is not None:
        mask = jnp.sign(sparse_ref[0])
        keep = 1.0 - mask
        anchor = mask * x0
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1 : h + 1, 1 : w + 1] = x0

    def body(_, carry):
        y = center_x0
        for d, (dy, dx) in enumerate(OFFSETS_2D_REFERENCE):
            y = y + gates_ref[d] * pad_ref[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        if sparse_ref is not None:
            y = keep * y + anchor
        pad_ref[1 : h + 1, 1 : w + 1] = y
        return carry

    lax.fori_loop(0, steps, body, 0, unroll=False)
    out_ref[0] = pad_ref[1 : h + 1, 1 : w + 1]


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
    return pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        in_specs=in_specs,
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((8, h, w), jnp.float32),
            pltpu.VMEM((h + 2, w + 2), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


def _fwd_kernel_nosparse(guid_ref, blur_ref, out_ref, gates_ref, pad_ref, **kw):
    _fwd_kernel(guid_ref, blur_ref, None, out_ref, gates_ref, pad_ref, **kw)


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
