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

Gradients: `cspn2d_pallas` has a custom VJP with a fused backward kernel
(checkpointed in-VMEM forward replay + grouped adjoint stencil; see the
"fused backward kernel" section below), ~7x faster than XLA
rematerialization and verified against autodiff of the reference to ~3e-7.
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


# The Mosaic compiler's default scoped-VMEM limit is 16 MB, far below the
# v5e's 128 MB physical VMEM; the kernels request a higher limit explicitly
# (empirically validated: 64-100 MB compiles and runs on v5e).  The guard
# below still routes truly oversized images to the XLA fallbacks: forward ->
# composed reference (cspn.py dispatch), backward -> rematerialized autodiff
# of the reference (below) while keeping the fused forward.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_VMEM_BUDGET_BYTES = 96 * 1024 * 1024
def fwd_fits_vmem(h: int, w: int, io_bytes: int = 4) -> bool:
    # inputs (8+1+1) x2 for grid double-buffering at the HBM I/O dtype,
    # output x2 (f32) + 9 f32 scratch planes.  bf16 I/O (io_bytes=2)
    # extends the whole-image range ~1.5x (e.g. 2x704x1216 KITTI frames
    # run whole-image instead of row-tiled).
    return h * w * (20 * io_bytes + 11 * 4) <= _VMEM_BUDGET_BYTES


def bwd_fits_vmem(h: int, w: int, steps: int) -> bool:
    # Backward buffers (fori_loop form -- compile time is steps-independent):
    # guid/dguid (aliased, 8) + g2 (8) + 8 single planes + ckpt (n_seg) +
    # seg (ckpt_every) + xpad + ~5 planes of vector temps, at Mosaic-padded
    # tile sizes.
    hp, wp = h + (-h) % 8, w + (-w) % 128
    ck = _pick_ckpt(steps)
    planes = 30 + steps // ck + ck
    return planes * hp * wp * 4 <= _VMEM_BUDGET_BYTES


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
    guid_ref,  # (P, 8, H, W) VMEM (P = images packed along lanes, 1 or 2)
    blur_ref,  # (P, H, W) VMEM
    sparse_ref,  # (P, H, W) VMEM or None
    out_ref,  # (P, H, W) VMEM
    g2_ref,  # (8, H, Wp) VMEM scratch: normalized gates, lane-unshifted
    xpad_ref,  # (H+2, Wp) VMEM scratch: depth state padded along H only
    *,
    steps: int,
    norm_abs: bool,
):
    """Wp = P*W + 2*(P-1): P images side by side along the lane dimension
    with 2-column zero separators.  W is usually not a lane-tile multiple
    (NYU 304 pads to 384, 26% dead lanes); packing P=2 images into one
    640-lane block cuts the padding waste to 5%.  The separator columns
    carry zero gates and zero state, which reproduces the out-of-image
    zero-neighbor semantics of the reference's padded canvases exactly
    (cspn.py:104-129): contributions across an image edge multiply a zero
    separator value, and the separator state stays zero because its gates,
    x0 and base are all zero."""
    h, w = out_ref.shape[1], out_ref.shape[2]
    n_pack = out_ref.shape[0]

    def packed(img_ref, c=None):
        """Concatenate P single-image planes along lanes with 2-col zeros.
        Upcasts to f32 (inputs may ride HBM as bf16, io_dtype)."""
        parts = []
        for p in range(n_pack):
            plane = img_ref[p] if c is None else img_ref[p, c]
            plane = plane.astype(jnp.float32)
            if p:
                parts.append(jnp.zeros((h, 2), jnp.float32))
            parts.append(plane)
        return parts[0] if n_pack == 1 else jnp.concatenate(parts, axis=-1)

    # --- B_d[i, j] = g_d[i + dy_d, j]: sublane shift only; images written
    # straight into the canvas at their lane offsets (no concat temps) ---
    xpad_ref[:] = jnp.zeros_like(xpad_ref)  # reused as padding canvas for gates
    for d, (dy, _) in enumerate(_OFFS):
        for p in range(n_pack):
            g = guid_ref[p, d].astype(jnp.float32)
            if norm_abs:
                g = jnp.abs(g)
            xpad_ref[1 : h + 1, p * (w + 2) : p * (w + 2) + w] = g
        g2_ref[d] = xpad_ref[1 + dy : 1 + dy + h, :]

    # --- canvas normalizer A[i,j] = sum_d |B_d[i, j + dx_d]|: 2 lane shifts ---
    col_abs = {
        dx: sum(jnp.abs(g2_ref[d]) for d in ds) for dx, ds in _BY_DX.items()
    }
    denom = col_abs[0] + _shift_w(col_abs[1], 1) + _shift_w(col_abs[-1], -1)
    # A == 0 iff ALL eight |B_d| vanish, so dividing them by max(A, tiny)
    # yields exactly-zero gates there -- identical to the guarded-select
    # form but one op instead of four
    inv = 1.0 / jnp.maximum(denom, 1e-30)
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
    # anchoring folded into the gates: y = keep*(sum g2.x + center*x0) + m*x0
    # = sum (keep.g2).x + [keep*center*x0 + m*x0], so the step body is the
    # VPU minimum for this stencil: 8 mul + 7 add + 2 lane shifts + 1 add.
    # NB keep multiplies at OUTPUT coords, g2 is lane-unshifted (G2_d[i,j]
    # multiplies into output [i, j-dx]), so fold shift_w(keep, -dx) per group.
    x0 = packed(blur_ref)
    center_x0 = (1.0 - gate_sum) * x0
    if sparse_ref is not None:
        mask = jnp.sign(packed(sparse_ref))
        keep_x = 1.0 - mask
        base = keep_x * center_x0 + mask * x0
        keep_by_dx = {0: keep_x, 1: _shift_w(keep_x, -1), -1: _shift_w(keep_x, 1)}
        for dx, ds in _BY_DX.items():
            for d in ds:
                g2_ref[d] = g2_ref[d] * keep_by_dx[dx]
    else:
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
        y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1) + base
        xpad_ref[1 : h + 1, :] = y
        return carry

    lax.fori_loop(0, steps, body, 0, unroll=False)
    for p in range(n_pack):
        out_ref[p] = xpad_ref[1 : h + 1, p * (w + 2) : p * (w + 2) + w]


def _fwd_kernel_nosparse(guid_ref, blur_ref, out_ref, g2_ref, xpad_ref, **kw):
    _fwd_kernel(guid_ref, blur_ref, None, out_ref, g2_ref, xpad_ref, **kw)


def _cspn2d_pallas_impl(
    guidance_cf: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None,
    steps: int,
    norm_type: str,
    interpret: bool,
    io_dtype=jnp.float32,
) -> jnp.ndarray:
    n, _, h, w = guidance_cf.shape
    use_sparse = sparse_depth is not None
    io_dtype = jnp.dtype(io_dtype)
    # pack 2 images along lanes (separated by 2 zero columns) when W is not
    # a lane-tile multiple: NYU W=304 pads to 384 lanes (26% of VPU work
    # wasted); a 610-lane pair block pads to 640 (5% waste).  Lane-aligned
    # widths and odd batches keep the 1-image grid.
    n_pack = 2 if (
        n % 2 == 0
        and w % 128 != 0
        and fwd_fits_vmem(h, 2 * w + 2, io_dtype.itemsize)
    ) else 1
    wp = n_pack * w + 2 * (n_pack - 1)
    kernel = functools.partial(
        _fwd_kernel if use_sparse else _fwd_kernel_nosparse,
        steps=steps,
        norm_abs="abs" in norm_type,
    )
    img_spec = pl.BlockSpec(
        (n_pack, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (n_pack, 8, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        img_spec,
    ]
    args = [guidance_cf.astype(io_dtype), blur_depth.astype(io_dtype)]
    if use_sparse:
        in_specs.append(img_spec)
        args.append(sparse_depth.astype(io_dtype))
    flops_step = 8 * 2 * h * w
    return pl.pallas_call(
        kernel,
        grid=(n // n_pack,),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        in_specs=in_specs,
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((8, h, wp), jnp.float32),
            pltpu.VMEM((h + 2, wp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * steps * flops_step,
            bytes_accessed=n * h * w * (10 * io_dtype.itemsize + 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)


# --- fused halo-segment kernel (spatially-sharded path) --------------------
#
# parallel/halo.py shards image rows over the mesh and alternates k-step
# local propagation with 1-row-per-step halo exchanges over ICI.  The local
# k-step block previously ran as the composed XLA stencil (8 shifted reads +
# FMA per step, one HBM round-trip per step); this kernel runs the whole
# k-step segment in VMEM: HBM traffic per segment = one read of
# (8 gates + base [+keep] + x) + one write of x, i.e. ~11 planes per k steps
# instead of ~10 per step.  Gates/center/mask are normalized once in XLA on
# the halo-extended block (unchanged semantics, including the cross-shard
# denominators), so the kernel takes them pre-normalized.


def _halo_seg_kernel(
    g_ref,  # (1, 8, He, W): normalized gates, OUTPUT coords (gather form)
    base_ref,  # (1, He, W): keep*center*x0 + mask*x0 (or center*x0)
    keep_ref,  # (1, He, W) or None: 1 - anchor mask
    x_ref,  # (1, He, W): incoming state (halo rows refreshed by caller)
    out_ref,  # (1, He, W)
    g2_ref,  # (8, He, W) scratch: lane-unshifted gates
    xpad_ref,  # (He+2, W) scratch
    *,
    k_steps: int,
):
    h, w = out_ref.shape[1], out_ref.shape[2]
    # anchoring folded into the gates at prologue (see _fwd_kernel): the
    # step body is then the VPU minimum 8 mul + 7 add + 2 lane shifts + 1 add
    if keep_ref is not None:
        keep = keep_ref[0]
        keep_by_dx = {0: keep, 1: _shift_w(keep, -1), -1: _shift_w(keep, 1)}
        for d, (_, dx) in enumerate(_OFFS):
            g2_ref[d] = _shift_w(g_ref[0, d], -dx) * keep_by_dx[dx]
    else:
        for d, (_, dx) in enumerate(_OFFS):
            g2_ref[d] = _shift_w(g_ref[0, d], -dx)  # G2_d[i,j] = gate_d[i,j-dx]
    base = base_ref[0]
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, :] = x_ref[0]

    def body(_, carry):
        rows = {dy: xpad_ref[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(g2_ref[d] * rows[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1) + base
        xpad_ref[1 : h + 1, :] = y
        return carry

    lax.fori_loop(0, k_steps, body, 0, unroll=False)
    out_ref[0] = xpad_ref[1 : h + 1, :]


def _halo_seg_kernel_nokeep(g_ref, base_ref, x_ref, out_ref, g2_ref,
                            xpad_ref, **kw):
    _halo_seg_kernel(g_ref, base_ref, None, x_ref, out_ref, g2_ref,
                     xpad_ref, **kw)


def _halo_segment_ref(gates_cf, base, keep, x, k_steps):
    """Composed-XLA equivalent of the segment (backward rematerializes
    through this): y = sum_d gate_d * x[.+dy_d, .+dx_d]; y = keep*y + base."""
    from cspn_tpu.ops.neighbors import OFFSETS_2D_REFERENCE, shift

    def step(x):
        y = sum(
            gates_cf[:, d] * shift(x, off, axes=(-2, -1))
            for d, off in enumerate(OFFSETS_2D_REFERENCE)
        )
        return keep * y + base if keep is not None else y + base

    for _ in range(k_steps):
        x = step(x)
    return x


def _halo_segment_impl(gates_cf, base, keep, x, k_steps, interpret):
    n, _, h, w = gates_cf.shape
    use_keep = keep is not None
    kernel = functools.partial(
        _halo_seg_kernel if use_keep else _halo_seg_kernel_nokeep,
        k_steps=k_steps,
    )
    img = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        img,
    ]
    args = [gates_cf, base]
    if use_keep:
        in_specs.append(img)
        args.append(keep)
    in_specs.append(img)
    args.append(x)
    # inside shard_map the output varies over the same mesh axes as x
    vma = getattr(jax.typeof(x), "vma", None)
    out_sds = (
        jax.ShapeDtypeStruct((n, h, w), jnp.float32, vma=vma)
        if vma
        else jax.ShapeDtypeStruct((n, h, w), jnp.float32)
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=out_sds,
        in_specs=in_specs,
        out_specs=img,
        scratch_shapes=[
            pltpu.VMEM((8, h, w), jnp.float32),
            pltpu.VMEM((h + 2, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * k_steps * 8 * 2 * h * w,
            bytes_accessed=n * (8 + 3) * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)


def _halo_seg_bwd_kernel(
    g_ref,  # (1, 8, He, W): normalized gather-form gates (output coords)
    base_ref,  # (1, He, W)
    keep_ref,  # (1, He, W) or None
    x_ref,  # (1, He, W): segment input state
    ct_ref,  # (1, He, W): cotangent of the segment output
    dg_ref,  # (1, 8, He, W) out -- used as the G2bar accumulator in-sweep
    dbase_ref,  # (1, He, W) out
    dkeep_ref,  # (1, He, W) out, or None
    dx_ref,  # (1, He, W) out
    g2_ref,  # (8, He, W) scratch: keep-folded lane-unshifted gates
    seg_ref,  # (k_steps, He+2, W) scratch: padded pre-step states
    xpad_ref,  # (He+2, W) scratch
    v_ref,  # (He, W) scratch: adjoint state
    bbar_ref,  # (He, W) scratch
    *,
    k_steps: int,
):
    """Adjoint of `_halo_seg_kernel`: reverse-mode through k_steps of the
    fixed-gate recurrence x' = keep * S(x) + base entirely in VMEM.

    Unlike `_bwd_kernel` there is no normalization prologue/epilogue (the
    gates arrive pre-normalized from XLA on the halo-extended block), and
    the keep mask is FOLDED into the working gates exactly as the forward
    does -- which makes dkeep fall out of the same folded-gate cotangent
    accumulator for free:
        g2f_d[j] = gate_d[j+dx] * keep[j+dx]
        dgate_d  = shift_w(G2bar_d, dx) * keep
        dkeep   += shift_w(G2bar_d, dx) * gate_d    (summed over d)
    k_steps is the halo width K (typically <= 8), so the replay buffer
    holds every padded pre-step state: no checkpoint hierarchy needed.
    """
    h, w = x_ref.shape[1], x_ref.shape[2]
    use_keep = keep_ref is not None

    # ---- gate prep: identical fold to the forward kernel ----
    if use_keep:
        keep = keep_ref[0]
        keep_by_dx = {0: keep, 1: _shift_w(keep, -1), -1: _shift_w(keep, 1)}
        for d, (_, dx) in enumerate(_OFFS):
            g2_ref[d] = _shift_w(g_ref[0, d], -dx) * keep_by_dx[dx]
    else:
        for d, (_, dx) in enumerate(_OFFS):
            g2_ref[d] = _shift_w(g_ref[0, d], -dx)
    base = base_ref[0]

    def fwd_step(xp):
        rows = {dy: xp[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(g2_ref[d] * rows[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        return u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1) + base

    # ---- forward replay storing every padded pre-step state ----
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, :] = x_ref[0]

    def rek(k, c2):
        seg_ref[k] = xpad_ref[:]

        @pl.when(k + 1 < k_steps)
        def _():
            xpad_ref[1 : h + 1, :] = fwd_step(xpad_ref)

        return c2

    lax.fori_loop(0, k_steps, rek, 0, unroll=False)

    # ---- reverse sweep ----
    for d in range(8):
        dg_ref[0, d] = jnp.zeros((h, w), jnp.float32)
    bbar_ref[:] = jnp.zeros((h, w), jnp.float32)
    v_ref[:] = ct_ref[0]

    def rev(k2, c2):
        k = k_steps - 1 - k2
        v = v_ref[:]
        bbar_ref[:] = bbar_ref[:] + v
        ubar = {0: v, 1: _shift_w(v, -1), -1: _shift_w(v, 1)}
        for d, (dy, dx) in enumerate(_OFFS):
            dg_ref[0, d] = dg_ref[0, d] + ubar[dx] * seg_ref[
                k, 1 + dy : 1 + dy + h, :
            ]
        xpad_ref[:] = jnp.zeros_like(xpad_ref)
        for dy in (-1, 0, 1):
            contrib = sum(
                g2_ref[d] * ubar[_OFFS[d][1]]
                for d in range(8)
                if _OFFS[d][0] == dy
            )
            xpad_ref[1 + dy : 1 + dy + h, :] = (
                xpad_ref[1 + dy : 1 + dy + h, :] + contrib
            )
        v_ref[:] = xpad_ref[1 : h + 1, :]
        return c2

    lax.fori_loop(0, k_steps, rev, 0, unroll=False)

    # ---- epilogue ----
    dx_ref[0] = v_ref[:]
    dbase_ref[0] = bbar_ref[:]
    if use_keep:
        acc = jnp.zeros((h, w), jnp.float32)
        for d, (_, dx) in enumerate(_OFFS):
            shifted = _shift_w(dg_ref[0, d], dx)
            acc = acc + shifted * g_ref[0, d]
            dg_ref[0, d] = shifted * keep_ref[0]
        dkeep_ref[0] = acc
    else:
        for d, (_, dx) in enumerate(_OFFS):
            dg_ref[0, d] = _shift_w(dg_ref[0, d], dx)


def _halo_seg_bwd_kernel_nokeep(g_ref, base_ref, x_ref, ct_ref, dg_ref,
                                dbase_ref, dx_ref, g2_ref, seg_ref, xpad_ref,
                                v_ref, bbar_ref, **kw):
    _halo_seg_bwd_kernel(g_ref, base_ref, None, x_ref, ct_ref, dg_ref,
                         dbase_ref, None, dx_ref, g2_ref, seg_ref, xpad_ref,
                         v_ref, bbar_ref, **kw)


def halo_bwd_fits_vmem(he: int, w: int, k_steps: int) -> bool:
    """VMEM budget for the fused halo-segment backward (post padding):
    (8 gates + 4 in) + (8 + 3 out) + 8 g2 + k_steps padded replay planes
    + padded xpad + ~3 temps, doubled for grid pipelining headroom."""
    hp, wp = he + (-he) % 8, w + (-w) % 128
    plane = hp * wp * 4
    pad_plane = (hp + 8) * wp * 4
    need = (12 + 11 + 8 + 3) * plane + (k_steps + 1) * pad_plane
    return 2 * need <= _VMEM_BUDGET_BYTES


def _halo_segment_bwd_pallas(gates_cf, base, keep, x, ct, k_steps, interpret):
    n, _, h, w = gates_cf.shape
    use_keep = keep is not None
    kernel = functools.partial(
        _halo_seg_bwd_kernel if use_keep else _halo_seg_bwd_kernel_nokeep,
        k_steps=k_steps,
    )
    img = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(
        (1, 8, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [gspec, img] + ([img] if use_keep else []) + [img, img]
    args = [gates_cf, base] + ([keep] if use_keep else []) + [x, ct]
    vma = getattr(jax.typeof(x), "vma", None)

    def sds(shape):
        return (
            jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
            if vma
            else jax.ShapeDtypeStruct(shape, jnp.float32)
        )

    out_shape = [sds((n, 8, h, w)), sds((n, h, w))]
    out_specs = [gspec, img]
    if use_keep:
        out_shape.append(sds((n, h, w)))
        out_specs.append(img)
    out_shape.append(sds((n, h, w)))
    out_specs.append(img)
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((8, h, w), jnp.float32),
            pltpu.VMEM((k_steps, h + 2, w), jnp.float32),
            pltpu.VMEM((h + 2, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * k_steps * 3 * 8 * 2 * h * w,
            bytes_accessed=n * (12 + 11) * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    if use_keep:
        dg, dbase, dkeep, dx = outs
        return dg, dbase, dkeep, dx
    dg, dbase, dx = outs
    return dg, dbase, None, dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _halo_segment(gates_cf, base, keep, x, k_steps, interpret):
    return _halo_segment_impl(gates_cf, base, keep, x, k_steps, interpret)


def _halo_segment_fwd(gates_cf, base, keep, x, k_steps, interpret):
    out = _halo_segment_impl(gates_cf, base, keep, x, k_steps, interpret)
    return out, (gates_cf, base, keep, x)


def _halo_segment_bwd(k_steps, interpret, residuals, ct):
    gates_cf, base, keep, x = residuals
    n, _, he, w = gates_cf.shape
    if halo_bwd_fits_vmem(he, w, k_steps):
        # fused in-VMEM replay + adjoint sweep (the sharded-training path
        # no longer pays the composed-XLA ~7x backward penalty; VERDICT r3)
        return _halo_segment_bwd_pallas(
            gates_cf, base, keep, x, ct, k_steps, interpret
        )
    if keep is None:
        _, vjp = jax.vjp(
            lambda g, b, xx: _halo_segment_ref(g, b, None, xx, k_steps),
            gates_cf, base, x,
        )
        dg, db, dx = vjp(ct)
        return dg, db, None, dx
    _, vjp = jax.vjp(
        lambda g, b, k, xx: _halo_segment_ref(g, b, k, xx, k_steps),
        gates_cf, base, keep, x,
    )
    return vjp(ct)


_halo_segment.defvjp(_halo_segment_fwd, _halo_segment_bwd)


def cspn2d_halo_segment(
    gates_cf: jnp.ndarray,
    base: jnp.ndarray,
    keep: jnp.ndarray | None,
    x: jnp.ndarray,
    k_steps: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """k propagation steps on a halo-extended local block, fused in VMEM.

    gates_cf: [n, 8, He, W] normalized gather-form gates (output coords);
    base: [n, He, W] = keep*center*x0 + mask*x0; keep: [n, He, W] or None;
    x: [n, He, W] running state.  Backward is the fused in-VMEM replay +
    adjoint sweep when it fits (halo_bwd_fits_vmem), else rematerializes
    through the composed form (exact adjoint).  Used by parallel/halo.py.
    """
    if interpret is None:
        interpret = _interpret_default()
    return _halo_segment(
        gates_cf.astype(jnp.float32),
        base.astype(jnp.float32),
        None if keep is None else keep.astype(jnp.float32),
        x.astype(jnp.float32),
        k_steps,
        interpret,
    )


# --- fused paddle-semantics 2D multi-step kernel ---------------------------
#
# cspn_nd's 2D branch (the paddle demo's --dimNum=2 path, demo.py:41-43):
# per-pixel sum-normalized gates, center weight coupled to the RUNNING state
#     x' = (1 - sum_d w_d) * x + sum_d w_d * x[p + off_d]
# -- unlike the pytorch-semantics kernel there is no canvas normalization
# and no anchoring, so the whole multi-step loop is the VPU-minimum stencil
# with gates resident in VMEM (one HBM round-trip total, like the 3D
# whole-volume kernel).  The paddle raster gate order is the exact REVERSE
# of the reference order _OFFS uses, so the XLA wrapper flips the gate axis
# instead of introducing a second offset table.


def _paddle2d_kernel(
    g_ref,  # (1, 8, H, W): per-pixel normalized gates, _OFFS channel order
    c_ref,  # (1, H, W): center weight 1 - sum_d w_d
    x_ref,  # (1, H, W)
    out_ref,  # (1, H, W)
    g2_ref,  # (8, H, W) scratch: lane-unshifted gates
    xpad_ref,  # (H+2, W) scratch
    *,
    steps: int,
):
    h, w = out_ref.shape[1], out_ref.shape[2]
    for d, (_, dx) in enumerate(_OFFS):
        g2_ref[d] = _shift_w(g_ref[0, d], -dx)
    center = c_ref[0]
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, :] = x_ref[0]

    def body(_, carry):
        rows = {dy: xpad_ref[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(g2_ref[d] * rows[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        y = (
            u[0]
            + _shift_w(u[1], 1)
            + _shift_w(u[-1], -1)
            + center * xpad_ref[1 : h + 1, :]
        )
        xpad_ref[1 : h + 1, :] = y
        return carry

    lax.fori_loop(0, steps, body, 0, unroll=False)
    out_ref[0] = xpad_ref[1 : h + 1, :]


def paddle2d_fits_vmem(h: int, w: int) -> bool:
    """~22 f32 planes (8 gates in + 8 unshifted + state/center/out + padded
    canvas), doubled for grid double-buffering headroom."""
    hp, wp = h + (-h) % 8, w + (-w) % 128
    return 2 * 22 * hp * wp * 4 <= _VMEM_BUDGET_BYTES


def _cspn2d_paddle_impl(guide, feat, steps, interpret):
    n, h, w, c = feat.shape
    a = jnp.abs(guide).reshape(n, h, w, c, 8)
    s = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-12)
    wn = a / s
    center = 1.0 - jnp.sum(wn, axis=-1)  # [n, h, w, c]
    wn = wn[..., ::-1]  # paddle raster order -> _OFFS (reference) order
    w_cf = wn.transpose(0, 3, 4, 1, 2).reshape(n * c, 8, h, w)
    c_cf = center.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    x_cf = feat.transpose(0, 3, 1, 2).reshape(n * c, h, w)

    img = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_paddle2d_kernel, steps=steps),
        grid=(n * c,),
        out_shape=jax.ShapeDtypeStruct((n * c, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (1, 8, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            img,
            img,
        ],
        out_specs=img,
        scratch_shapes=[
            pltpu.VMEM((8, h, w), jnp.float32),
            pltpu.VMEM((h + 2, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * c * steps * 9 * 2 * h * w,
            bytes_accessed=n * c * 11 * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(w_cf.astype(jnp.float32), c_cf.astype(jnp.float32), x_cf.astype(jnp.float32))
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _cspn2d_paddle_vjp(guide, feat, steps, interpret):
    return _cspn2d_paddle_impl(guide, feat, steps, interpret)


def _cspn2d_paddle_fwd(guide, feat, steps, interpret):
    return _cspn2d_paddle_impl(guide, feat, steps, interpret), (guide, feat)


def _cspn2d_paddle_bwd(steps, interpret, residuals, ct):
    # rematerialize through the XLA reference (exact adjoint incl. the
    # normalization and the center term's gate dependence)
    guide, feat = residuals
    _, vjp = jax.vjp(
        lambda g, f: cspn_ref.cspn_nd_reference(g, f, kernel_size=3, steps=steps),
        guide,
        feat,
    )
    return vjp(ct)


_cspn2d_paddle_vjp.defvjp(_cspn2d_paddle_fwd, _cspn2d_paddle_bwd)


# --- single-device row-tiled fused forward (oversized images) --------------
#
# Images whose 31-plane working set exceeds the whole-image kernel's VMEM
# budget used to drop to the XLA-composed path (~10 planes of HBM traffic
# per step, 24x).  Instead: a grid over row tiles where each tile manually
# DMAs its `steps`-row halo-extended slice of the inputs straight from HBM
# into VMEM (no intermediate materialization of overlapping tiles), runs
# the SAME normalize + steps body as the whole-image kernel, and DMAs its
# interior rows out.  Tile interiors are exact by the usual halo argument
# (cut rows are stale by <= 1 row/step, and only interior rows are
# written).  HBM traffic ~ (1 + 2*halo/tile_h) x one read of the inputs +
# one write of the output, independent of `steps`.


def _tiled_rows_budget(w: int) -> int:
    """Max halo-extended tile height the DMA-tiled kernel holds in VMEM:
    gin (8, reused in place for the normalized gates) + xpad + bin + sin +
    out stage + ~6 planes of vector temps."""
    wp = w + (-w) % 128
    return _VMEM_BUDGET_BYTES // (18 * wp * 4)


def tiled_fwd_fits(h: int, w: int, steps: int = 24) -> bool:
    halo = -(-steps // 8) * 8
    return _tiled_rows_budget(w) >= 2 * halo + 8


def _fwd_dma_kernel(
    guid_hbm,  # [N, 8, H, W] ANY (HBM), H % 8 == 0
    blur_hbm,  # [N, H, W] ANY
    sparse_hbm,  # [N, H, W] ANY or absent
    out_hbm,  # [N, H, W] ANY
    gin_ref,  # (8, rows, W) VMEM scratch: guidance tile, then G2 in place
    xpad_ref,  # (rows+16, W) VMEM scratch: 8-row top pad (DMA alignment), state at [8, 8+rows)
    bin_ref,  # (rows, W) VMEM scratch: blur tile
    sin_ref,  # (rows, W) VMEM scratch or absent
    sems,  # DMA semaphores (4,)
    *,
    steps: int,
    norm_abs: bool,
    tile_h: int,
    halo: int,
    h: int,
):
    """All row offsets (s0, o0, io) are multiples of 8 by construction
    (h, tile_h, halo, rows are), which Mosaic requires to slice (8,128)-tiled
    memrefs at dynamic offsets; the state sits at an 8-row top pad inside
    xpad so the final interior DMA source offset 8+io is aligned too."""
    rows = gin_ref.shape[1]
    i, t = pl.program_id(0), pl.program_id(1)
    # output rows [o0, o0+tile_h); the last tile is pulled up so a ragged H
    # just recomputes a few rows.  Source rows [s0, s0+rows) clamped into
    # the image: at global borders the tile simply extends further inward,
    # and the kernel's zero row padding is then the TRUE image border.
    o0 = pl.multiple_of(jnp.minimum(t * tile_h, h - tile_h), 8)
    s0 = pl.multiple_of(jnp.clip(o0 - halo, 0, h - rows), 8)

    in_copies = [
        pltpu.make_async_copy(
            guid_hbm.at[i, :, pl.ds(s0, rows), :], gin_ref, sems.at[0]
        ),
        pltpu.make_async_copy(
            blur_hbm.at[i, pl.ds(s0, rows), :], bin_ref, sems.at[1]
        ),
    ]
    if sin_ref is not None:
        in_copies.append(
            pltpu.make_async_copy(
                sparse_hbm.at[i, pl.ds(s0, rows), :], sin_ref, sems.at[2]
            )
        )
    for c in in_copies:
        c.start()
    for c in in_copies:
        c.wait()

    # --- identical body to _fwd_kernel (n_pack=1, h -> rows), with the
    # normalized gates written back IN PLACE over the guidance tile ---
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    for d, (dy, _) in enumerate(_OFFS):
        g = gin_ref[d]
        if norm_abs:
            g = jnp.abs(g)
        xpad_ref[8 : rows + 8, :] = g
        gin_ref[d] = xpad_ref[8 + dy : 8 + dy + rows, :]
    col_abs = {
        dx: sum(jnp.abs(gin_ref[d]) for d in ds) for dx, ds in _BY_DX.items()
    }
    denom = col_abs[0] + _shift_w(col_abs[1], 1) + _shift_w(col_abs[-1], -1)
    inv = 1.0 / jnp.maximum(denom, 1e-30)
    inv_by_dx = {0: inv, 1: _shift_w(inv, -1), -1: _shift_w(inv, 1)}
    col_sum = {}
    for dx, ds in _BY_DX.items():
        acc = None
        for d in ds:
            g2 = gin_ref[d] * inv_by_dx[dx]
            gin_ref[d] = g2
            acc = g2 if acc is None else acc + g2
        col_sum[dx] = acc
    gate_sum = col_sum[0] + _shift_w(col_sum[1], 1) + _shift_w(col_sum[-1], -1)

    x0 = bin_ref[:]
    center_x0 = (1.0 - gate_sum) * x0
    if sin_ref is not None:
        mask = jnp.sign(sin_ref[:])
        keep_x = 1.0 - mask
        base = keep_x * center_x0 + mask * x0
        keep_by_dx = {0: keep_x, 1: _shift_w(keep_x, -1), -1: _shift_w(keep_x, 1)}
        for dx, ds in _BY_DX.items():
            for d in ds:
                gin_ref[d] = gin_ref[d] * keep_by_dx[dx]
    else:
        base = center_x0
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[8 : rows + 8, :] = x0

    def body(_, carry):
        rws = {dy: xpad_ref[8 + dy : 8 + dy + rows, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(gin_ref[d] * rws[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1) + base
        xpad_ref[8 : rows + 8, :] = y
        return carry

    lax.fori_loop(0, steps, body, 0, unroll=False)

    io = o0 - s0  # interior offset inside the tile (multiple of 8)
    out_copy = pltpu.make_async_copy(
        xpad_ref.at[pl.ds(pl.multiple_of(8 + io, 8), tile_h), :],
        out_hbm.at[i, pl.ds(o0, tile_h), :],
        sems.at[3],
    )
    out_copy.start()
    out_copy.wait()


def _fwd_dma_kernel_nosparse(guid_hbm, blur_hbm, out_hbm, gin_ref, xpad_ref,
                             bin_ref, sems, **kw):
    _fwd_dma_kernel(guid_hbm, blur_hbm, None, out_hbm, gin_ref, xpad_ref,
                    bin_ref, None, sems, **kw)


def _cspn2d_tiled_impl(guidance_cf, blur_depth, sparse_depth, steps,
                       norm_type, interpret):
    n, _, h0, w0 = guidance_cf.shape
    # zero-padding H to a multiple of 8 (sublane tile) and W to a multiple
    # of 128 (lane tile) is EXACTLY equivalent: zero guidance rows/columns
    # behave as the reference's zero image border.  Mosaic requires both for
    # manual DMA slicing of tiled memrefs (dynamic row offsets must be
    # 8-aligned; sliced widths must be lane-tile-aligned).
    h = h0 + (-h0) % 8
    w = w0 + (-w0) % 128
    if h != h0 or w != w0:
        pads3 = [(0, 0), (0, h - h0), (0, w - w0)]
        guidance_cf = jnp.pad(guidance_cf, [(0, 0), (0, 0)] + pads3[1:])
        blur_depth = jnp.pad(blur_depth, pads3)
        if sparse_depth is not None:
            sparse_depth = jnp.pad(sparse_depth, pads3)
    halo = -(-steps // 8) * 8  # >= steps, multiple of 8
    budget = _tiled_rows_budget(w)
    tile_h = (budget - 2 * halo) // 8 * 8
    if tile_h < 8:
        raise ValueError(f"width {w} too large for the tiled kernel's VMEM budget")
    n_tiles = -(-h // tile_h)
    tile_h = min(tile_h, -(-h // (8 * n_tiles)) * 8)  # balance tiles
    rows = min(tile_h + 2 * halo, h)
    use_sparse = sparse_depth is not None
    kernel = functools.partial(
        _fwd_dma_kernel if use_sparse else _fwd_dma_kernel_nosparse,
        steps=steps,
        norm_abs="abs" in norm_type,
        tile_h=tile_h,
        halo=halo,
        h=h,
    )
    args = [guidance_cf.astype(jnp.float32), blur_depth.astype(jnp.float32)]
    if use_sparse:
        args.append(sparse_depth.astype(jnp.float32))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    scratch = [
        pltpu.VMEM((8, rows, w), jnp.float32),  # gin / G2 in place
        pltpu.VMEM((rows + 16, w), jnp.float32),  # xpad (8-row top pad)
        pltpu.VMEM((rows, w), jnp.float32),  # bin
    ]
    if use_sparse:
        scratch.append(pltpu.VMEM((rows, w), jnp.float32))  # sin
    scratch.append(pltpu.SemaphoreType.DMA((4,)))
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        in_specs=[any_spec] * len(args),
        out_specs=any_spec,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=n * steps * 8 * 2 * h * w,
            bytes_accessed=n * 11 * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    return out[:, :h0, :w0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cspn2d_tiled_vjp(guidance_cf, blur_depth, sparse_depth, steps, norm_type,
                      interpret):
    return _cspn2d_tiled_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret
    )


def _cspn2d_tiled_fwd(guidance_cf, blur_depth, sparse_depth, steps, norm_type,
                      interpret):
    out = _cspn2d_tiled_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret
    )
    return out, (guidance_cf, blur_depth, sparse_depth)


def _cspn2d_tiled_bwd(steps, norm_type, interpret, residuals, ct):
    # oversized-image backward: rematerialize through the XLA reference
    # (same fallback the whole-image kernel uses beyond bwd_fits_vmem)
    guidance_cf, blur_depth, sparse_depth = residuals

    def ref_fwd(g_cf, blur):
        return cspn_ref.cspn2d_reference(
            jnp.moveaxis(g_cf, 1, -1), blur, sparse_depth,
            steps=steps, norm_type=norm_type,
        )

    _, vjp = jax.vjp(ref_fwd, guidance_cf, blur_depth)
    dg, db = vjp(ct)
    ds = jnp.zeros_like(sparse_depth) if sparse_depth is not None else None
    return dg, db, ds


_cspn2d_tiled_vjp.defvjp(_cspn2d_tiled_fwd, _cspn2d_tiled_bwd)


def cspn2d_tiled(
    guidance: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None = None,
    *,
    steps: int = 24,
    norm_type: str = "8sum",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Row-tiled fused 2D CSPN for images beyond fwd_fits_vmem.

    guidance [N, H, W, 8]; blur/sparse [N, H, W].  Matches
    cspn_ref.cspn2d_reference exactly (every output row is an interior row
    of some tile; tests).  Differentiable: backward rematerializes through
    the XLA reference.
    """
    if interpret is None:
        interpret = _interpret_default()
    g_cf = jnp.moveaxis(guidance, -1, 1)
    return _cspn2d_tiled_vjp(
        g_cf, blur_depth, sparse_depth, steps, norm_type, interpret
    )


# --- fused backward kernel -------------------------------------------------
#
# Reverse-mode through the linear recurrence x_{t+1} = keep*S(x_t) + base:
#   - gate prep identical to the forward (signed G2 stored; abs taken at use
#     for '8sum_abs' so the sign survives for the normalization backward),
#   - forward replay with checkpoints every _pick_ckpt(steps) steps (VMEM
#     holds T/ckpt checkpoint planes + one ckpt-deep segment buffer),
#   - per reverse step: ubar_dx = shift_W(keep*v, -dx) (2 lane shifts),
#     gate-grad FMA into the (aliased) dguidance buffer, and the adjoint
#     stencil accumulated per-row-offset into the padded xbar buffer,
#   - epilogue: gate cotangents + the center-term (gate_sum) cotangent are
#     pushed through the canvas normalization (quotient rule) and unshifted
#     back to guidance coordinates.
#
# The guidance input is aliased with the gate-gradient output
# (input_output_aliases), so training donates the guidance activation.

_CKPT = 4


def _pick_ckpt(steps: int) -> int:
    """Largest checkpoint interval <= _CKPT that divides `steps` (uniform
    segments keep the fori_loop bodies shape-invariant)."""
    for c in (_CKPT, 3, 2):
        if steps % c == 0:
            return min(c, steps)
    return 1


def _bwd_kernel(
    guid_ref,  # (8, H, W) in VMEM -- ALIASED with dguid_ref
    blur_ref,  # (H, W)
    sparse_ref,  # (H, W) or None
    ct_ref,  # (H, W) cotangent of the output depth
    dguid_ref,  # (8, H, W) out (same buffer as guid_ref)
    dblur_ref,  # (H, W) out
    g2_ref,  # (8, H, W) scratch: signed normalized lane-unshifted gates
    inv_ref,  # (H, W) scratch: 1/A (0 where A == 0)
    gsum_ref,  # (H, W) scratch
    ckpt_ref,  # (n_seg, H, W) scratch: x at segment starts (ckpt[0] = blur)
    seg_ref,  # (ckpt_every, H+2, W) scratch: padded step inputs of a segment
    xpad_ref,  # (H+2, W) scratch
    v_ref,  # (H, W) scratch: adjoint state
    bbar_ref,  # (H, W) scratch: accumulated base cotangent
    *,
    steps: int,
    norm_abs: bool,
):
    h, w = blur_ref.shape

    # ---- gate prep (signed) ----
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    for d, (dy, _) in enumerate(_OFFS):
        xpad_ref[1 : h + 1, :] = guid_ref[d]
        g2_ref[d] = xpad_ref[1 + dy : 1 + dy + h, :]
    col_abs = {dx: sum(jnp.abs(g2_ref[d]) for d in ds) for dx, ds in _BY_DX.items()}
    denom = col_abs[0] + _shift_w(col_abs[1], 1) + _shift_w(col_abs[-1], -1)
    nonzero = denom > 0.0
    inv = jnp.where(nonzero, 1.0 / jnp.where(nonzero, denom, 1.0), 0.0)
    inv_ref[:] = inv
    inv_by_dx = {0: inv, 1: _shift_w(inv, -1), -1: _shift_w(inv, 1)}
    col_sum = {}
    for dx, ds in _BY_DX.items():
        acc = None
        for d in ds:
            g2 = g2_ref[d] * inv_by_dx[dx]
            g2_ref[d] = g2  # signed normalized (lane-unshifted)
            ge = jnp.abs(g2) if norm_abs else g2
            acc = ge if acc is None else acc + ge
        col_sum[dx] = acc
    gsum_ref[:] = col_sum[0] + _shift_w(col_sum[1], 1) + _shift_w(col_sum[-1], -1)

    def gate_eff(d):
        return jnp.abs(g2_ref[d]) if norm_abs else g2_ref[d]

    x0 = blur_ref[:]
    if sparse_ref is not None:
        m = jnp.sign(sparse_ref[:])
        keep = 1.0 - m
        base = keep * (1.0 - gsum_ref[:]) * x0 + m * x0
    else:
        keep = None
        base = (1.0 - gsum_ref[:]) * x0

    def fwd_step(xp):
        """xp: padded (H+2, W) state -> new interior (H, W)."""
        rows = {dy: xp[1 + dy : 1 + dy + h, :] for dy in (-1, 0, 1)}
        u = {
            dx: sum(gate_eff(d) * rows[_OFFS[d][0]] for d in ds)
            for dx, ds in _BY_DX.items()
        }
        y = u[0] + _shift_w(u[1], 1) + _shift_w(u[-1], -1)
        return (keep * y + base) if keep is not None else (y + base)

    # ---- forward pass storing segment-start checkpoints ----
    # fori_loop form (not Python-unrolled): code is emitted once per loop
    # body, so Mosaic compile time no longer scales with `steps` and the
    # fused backward stays usable at KITTI-size images.
    ckpt_every = _pick_ckpt(steps)
    n_seg = steps // ckpt_every
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, :] = x0
    ckpt_ref[0] = x0

    def seg_fwd(s, carry):
        def stepk(_, c2):
            xpad_ref[1 : h + 1, :] = fwd_step(xpad_ref)
            return c2

        lax.fori_loop(0, ckpt_every, stepk, 0, unroll=False)
        ckpt_ref[s + 1] = xpad_ref[1 : h + 1, :]
        return carry

    lax.fori_loop(0, n_seg - 1, seg_fwd, 0, unroll=False)

    # ---- reverse sweep ----
    for d in range(8):
        dguid_ref[d] = jnp.zeros((h, w), jnp.float32)  # holds G2bar during sweep
    bbar_ref[:] = jnp.zeros((h, w), jnp.float32)
    v_ref[:] = ct_ref[:]

    def seg_bwd(i, carry):
        s = n_seg - 1 - i
        # recompute the segment's step inputs x_{t0}..x_{t0+ckpt_every-1}
        xpad_ref[:] = jnp.zeros_like(xpad_ref)
        xpad_ref[1 : h + 1, :] = ckpt_ref[s]

        def rek(k, c2):
            seg_ref[k] = xpad_ref[:]

            @pl.when(k + 1 < ckpt_every)
            def _():
                xpad_ref[1 : h + 1, :] = fwd_step(xpad_ref)

            return c2

        lax.fori_loop(0, ckpt_every, rek, 0, unroll=False)

        def rev(k2, c2):
            k = ckpt_every - 1 - k2
            v = v_ref[:]
            bbar_ref[:] = bbar_ref[:] + v
            wv = keep * v if keep is not None else v
            ubar = {0: wv, 1: _shift_w(wv, -1), -1: _shift_w(wv, 1)}
            # gate grads (into the aliased dguid buffer)
            for d, (dy, dx) in enumerate(_OFFS):
                dguid_ref[d] = dguid_ref[d] + ubar[dx] * seg_ref[
                    k, 1 + dy : 1 + dy + h, :
                ]
            # adjoint stencil: xbar rows grouped by dy
            xpad_ref[:] = jnp.zeros_like(xpad_ref)
            for dy in (-1, 0, 1):
                contrib = sum(
                    gate_eff(d) * ubar[_OFFS[d][1]]
                    for d in range(8)
                    if _OFFS[d][0] == dy
                )
                xpad_ref[1 + dy : 1 + dy + h, :] = (
                    xpad_ref[1 + dy : 1 + dy + h, :] + contrib
                )
            v_ref[:] = xpad_ref[1 : h + 1, :]
            return c2

        lax.fori_loop(0, ckpt_every, rev, 0, unroll=False)
        return carry

    lax.fori_loop(0, n_seg, seg_bwd, 0, unroll=False)

    # ---- epilogue: input gradients ----
    v = v_ref[:]
    bbar = bbar_ref[:]
    if keep is not None:
        dblur_ref[:] = v + bbar * (keep * (1.0 - gsum_ref[:]) + m)
        gsumbar = -bbar * keep * x0
    else:
        dblur_ref[:] = v + bbar * (1.0 - gsum_ref[:])
        gsumbar = -bbar * x0

    # Ghatbar_d = G2bar_d shifted to gate coords, + center-term cotangent
    ghatbar = [
        _shift_w(dguid_ref[d], _OFFS[d][1]) + gsumbar for d in range(8)
    ]
    ghat = [_shift_w(g2_ref[d], _OFFS[d][1]) for d in range(8)]  # signed Ghat
    if norm_abs:
        t_sum = sum(gb * jnp.abs(g) for gb, g in zip(ghatbar, ghat))
    else:
        t_sum = sum(gb * g for gb, g in zip(ghatbar, ghat))
    inv = inv_ref[:]
    for d, (dy, dx) in enumerate(_OFFS):
        sg = jnp.sign(ghat[d])
        if norm_abs:
            gbar_signed = (sg * ghatbar[d] - sg * t_sum) * inv
        else:
            gbar_signed = (ghatbar[d] - sg * t_sum) * inv
        # unshift to guidance coordinates: dguid_d[p] = Gbar_d[p - delta_d]
        back = _shift_w(gbar_signed, -dx)
        xpad_ref[:] = jnp.zeros_like(xpad_ref)
        xpad_ref[1 : h + 1, :] = back
        dguid_ref[d] = xpad_ref[1 - dy : 1 - dy + h, :]


def _bwd_kernel_nosparse(guid_ref, blur_ref, ct_ref, dguid_ref, dblur_ref,
                         g2_ref, inv_ref, gsum_ref, ckpt_ref, seg_ref,
                         xpad_ref, v_ref, bbar_ref, **kw):
    _bwd_kernel(guid_ref, blur_ref, None, ct_ref, dguid_ref, dblur_ref,
                g2_ref, inv_ref, gsum_ref, ckpt_ref, seg_ref, xpad_ref,
                v_ref, bbar_ref, **kw)


def _bwd_kernel_grid(guid_ref, blur_ref, sparse_ref, ct_ref, dguid_ref,
                     dblur_ref, *scratch, **kw):
    """Grid-over-images wrapper: block specs carry a leading batch dim of 1."""
    _bwd_kernel(guid_ref.at[0], blur_ref.at[0],
                None if sparse_ref is None else sparse_ref.at[0],
                ct_ref.at[0], dguid_ref.at[0], dblur_ref.at[0], *scratch, **kw)


def _bwd_kernel_grid_nosparse(guid_ref, blur_ref, ct_ref, dguid_ref,
                              dblur_ref, *scratch, **kw):
    _bwd_kernel_grid(guid_ref, blur_ref, None, ct_ref, dguid_ref, dblur_ref,
                     *scratch, **kw)


def bwd_grid_fits_vmem(h: int, w: int, steps: int) -> bool:
    """The grid form double-buffers the (8+3) input + 9 output block planes
    on top of the map form's working set."""
    hp, wp = h + (-h) % 8, w + (-w) % 128
    ck = _pick_ckpt(steps)
    planes = 50 + steps // ck + ck
    return planes * hp * wp * 4 <= _VMEM_BUDGET_BYTES


def _cspn2d_bwd_pallas(guidance_cf, blur_depth, sparse_depth, ct, steps,
                       norm_type, interpret):
    """Fused backward.

    Default: one grid step per image — Mosaic pipelines the next image's
    input DMAs under the current image's replay/adjoint compute.  Images
    whose doubled block buffers exceed VMEM (e.g. 352x1216 KITTI frames)
    fall back to the sequential lax.map of single-image calls."""
    n, _, h, w = guidance_cf.shape
    use_sparse = sparse_depth is not None
    ckpt_every = _pick_ckpt(steps)
    n_seg = steps // ckpt_every
    scratch = [
        pltpu.VMEM((8, h, w), jnp.float32),  # g2
        pltpu.VMEM((h, w), jnp.float32),  # inv
        pltpu.VMEM((h, w), jnp.float32),  # gsum
        pltpu.VMEM((n_seg, h, w), jnp.float32),  # ckpt
        pltpu.VMEM((ckpt_every, h + 2, w), jnp.float32),  # seg
        pltpu.VMEM((h + 2, w), jnp.float32),  # xpad
        pltpu.VMEM((h, w), jnp.float32),  # v
        pltpu.VMEM((h, w), jnp.float32),  # bbar
    ]
    g32 = guidance_cf.astype(jnp.float32)
    b32 = blur_depth.astype(jnp.float32)
    c32 = ct.astype(jnp.float32)

    if bwd_grid_fits_vmem(h, w, steps):
        # Mosaic requires blocked slices to be tile-aligned: H to 8 sublanes,
        # W to 128 lanes (NYU 304 is not).  Zero-pad at the caller — EXACTLY
        # the reference's zero image border: padded pixels carry zero gates,
        # so the in-kernel normalization guard (denom > 0 -> inv = 0) keeps
        # their state/adjoint at zero and interior border pixels read zero
        # neighbor contributions, as in the unpadded form.
        hp, wp = h + (-h) % 8, w + (-w) % 128
        pad3 = ((0, 0), (0, hp - h), (0, wp - w))
        pad4 = ((0, 0), (0, 0), (0, hp - h), (0, wp - w))
        gp = jnp.pad(g32, pad4) if (hp, wp) != (h, w) else g32
        bp = jnp.pad(b32, pad3) if (hp, wp) != (h, w) else b32
        cp = jnp.pad(c32, pad3) if (hp, wp) != (h, w) else c32
        scratch_p = [
            pltpu.VMEM((8, hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((n_seg, hp, wp), jnp.float32),
            pltpu.VMEM((ckpt_every, hp + 2, wp), jnp.float32),
            pltpu.VMEM((hp + 2, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ]
        kernel = functools.partial(
            _bwd_kernel_grid if use_sparse else _bwd_kernel_grid_nosparse,
            steps=steps,
            norm_abs="abs" in norm_type,
        )
        img = pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((1, 8, hp, wp), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        if use_sparse:
            sp = sparse_depth.astype(jnp.float32)
            sp = jnp.pad(sp, pad3) if (hp, wp) != (h, w) else sp
            args = (gp, bp, sp, cp)
            in_specs = [gspec, img, img, img]
        else:
            args = (gp, bp, cp)
            in_specs = [gspec, img, img]
        dg, db = pl.pallas_call(
            kernel,
            grid=(n,),
            out_shape=(
                jax.ShapeDtypeStruct((n, 8, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(gspec, img),
            scratch_shapes=scratch_p,
            input_output_aliases={0: 0},  # guidance buffer -> gate grads
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*args)
        if (hp, wp) != (h, w):
            dg, db = dg[:, :, :h, :w], db[:, :h, :w]
        return dg, db

    kernel = functools.partial(
        _bwd_kernel if use_sparse else _bwd_kernel_nosparse,
        steps=steps,
        norm_abs="abs" in norm_type,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def one(args):
        ins = args
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((8, h, w), jnp.float32),
                jax.ShapeDtypeStruct((h, w), jnp.float32),
            ),
            in_specs=[vspec] * len(ins),
            out_specs=(vspec, vspec),
            scratch_shapes=scratch,
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*ins)

    if use_sparse:
        args = (g32, b32, sparse_depth.astype(jnp.float32), c32)
    else:
        args = (g32, b32, c32)
    dg, db = jax.lax.map(one, args)
    return dg, db


# --- custom VJP: pallas forward, reference-rematerialized backward ---------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _cspn2d_vjp(guidance_cf, blur_depth, sparse_depth, steps, norm_type,
                interpret, io_dtype):
    return _cspn2d_pallas_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret,
        io_dtype,
    )


def _cspn2d_fwd(guidance_cf, blur_depth, sparse_depth, steps, norm_type,
                interpret, io_dtype):
    out = _cspn2d_pallas_impl(
        guidance_cf, blur_depth, sparse_depth, steps, norm_type, interpret,
        io_dtype,
    )
    return out, (guidance_cf, blur_depth, sparse_depth)


def _cspn2d_bwd(steps, norm_type, interpret, io_dtype, residuals, ct):
    # backward runs on the f32 residuals regardless of the forward's HBM
    # I/O dtype (standard mixed-precision treatment: the bf16 forward is a
    # rounding of the f32 function; its exact adjoint differs only at the
    # rounding level, far below gradient noise -- metric-delta artifact)
    guidance_cf, blur_depth, sparse_depth = residuals
    n, _, h, w = guidance_cf.shape
    if not bwd_fits_vmem(h, w, steps):
        # fused backward kernel would overflow VMEM at this image size:
        # rematerialize through the XLA reference instead (keeps the fused
        # forward; ~7x slower backward but correct at any shape)
        def ref_fwd(g_cf, blur):
            return cspn_ref.cspn2d_reference(
                jnp.moveaxis(g_cf, 1, -1), blur, sparse_depth,
                steps=steps, norm_type=norm_type,
            )

        _, vjp = jax.vjp(ref_fwd, guidance_cf, blur_depth)
        dg, db = vjp(ct)
        ds = jnp.zeros_like(sparse_depth) if sparse_depth is not None else None
        return dg, db, ds
    dg, db = _cspn2d_bwd_pallas(
        guidance_cf, blur_depth, sparse_depth, ct, steps, norm_type, interpret
    )
    # sparse enters only through sign() -> zero gradient a.e. (matches torch)
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
    io_dtype=None,
):
    """Fused 2D CSPN (pytorch reference semantics, cspn.py:42-83).

    Args:
        guidance: [N, H, W, 8] (or [N, 8, H, W] with channel_first=True).
        blur_depth: [N, H, W].
        sparse_depth: optional [N, H, W].
        io_dtype: HBM I/O dtype for the inputs (None = float32).
            jnp.bfloat16 halves the kernel's HBM read traffic and VMEM
            input residency (all in-VMEM arithmetic stays f32); the
            rounding of gates/depth to bf16 is an opt-in accuracy trade
            (metric-delta artifact: result/bf16_io_eval.json).
    Returns [N, H, W] float32.
    """
    if interpret is None:
        interpret = _interpret_default()
    g_cf = guidance if channel_first else jnp.moveaxis(guidance, -1, 1)
    return _cspn2d_vjp(
        g_cf, blur_depth, sparse_depth, steps, norm_type, interpret,
        jnp.dtype(io_dtype or jnp.float32),
    )


def cspn_nd_pallas(guide, feat, *, kernel_size: int = 3, steps: int = 24):
    """Paddle-semantics nd CSPN fast path.

    3D volumes route to the whole-volume fused Pallas kernel when the bf16
    gate volume fits VMEM under the raised Mosaic limit (the v5e has 128 MB
    physical VMEM): gates are read from HBM once for all `steps` iterations,
    measured 1.7x faster than the cross-step-fused XLA form at the paddle
    demo shape (3.5 vs 5.9 ms per 48x64x128 volume, 24 steps).  2D maps
    route to the fused multi-step 2D kernel (_paddle2d_kernel) when they
    fit VMEM — the paddle wheel fused both ranks (cspn_paddle/demo.py:41-43,
    --dimNum=2), so the 2D demo path is kernel-fused here too.  Oversized
    shapes use the unrolled XLA form.  Gradients rematerialize through the
    XLA reference."""
    ndim = feat.ndim - 2
    if ndim == 3 and kernel_size == 3:
        n, d_sz, h, w, c = feat.shape
        # kernel pads H to sublane (8) and W to lane (128) multiples
        hp, wp = h + (-h) % 8, w + (-w) % 128
        bf16_need = 26 * d_sz * hp * wp * 2 + 8 * (d_sz + 2) * (hp + 2) * wp * 4
        if bf16_need <= 80 * 1024 * 1024:
            return _cspn3d_fused_vjp(guide, feat, steps)
    if ndim == 2 and kernel_size == 3 and paddle2d_fits_vmem(*feat.shape[1:3]):
        return _cspn2d_paddle_vjp(guide, feat, steps, _interpret_default())
    return cspn_ref.cspn_nd_reference(guide, feat, kernel_size=kernel_size, steps=steps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _cspn3d_fused_vjp(guide, feat, steps):
    from cspn_tpu.ops import cspn3d_pallas

    return cspn3d_pallas.cspn3d_fused(guide, feat, steps=steps)


def _cspn3d_fused_fwd(guide, feat, steps):
    return _cspn3d_fused_vjp(guide, feat, steps), (guide, feat)


def _cspn3d_fused_bwd(steps, residuals, ct):
    # Fused whole-volume backward kernel when it fits VMEM (checkpointed
    # in-VMEM replay + adjoint stencil, see cspn3d_pallas._bwd3_kernel);
    # otherwise rematerialize through the XLA reference (exact adjoint).
    guide, feat = residuals
    from cspn_tpu.ops import cspn3d_pallas

    n, d_sz, h, w, c = feat.shape
    if cspn3d_pallas.bwd3_fits_vmem(d_sz, h, w, steps):
        # recompute the per-channel normalized gates (cheap, one-shot), run
        # the fused propagation VJP, then push through the normalization
        # (quotient rule) and abs in XLA
        eps = 1e-12
        gbars, fbars = [], []
        for ch in range(c):
            g_raw = guide[..., ch * 26 : (ch + 1) * 26]
            a = jnp.abs(g_raw)
            s_sum = jnp.sum(a, axis=-1, keepdims=True)
            s_m = jnp.maximum(s_sum, eps)
            w_cf = jnp.moveaxis(a / s_m, -1, 1)  # [N, 26, D, H, W]
            wbar_cf, x0bar = cspn3d_pallas.affinity_propagate3d_fused_bwd(
                feat[..., ch], w_cf, ct[..., ch], steps=steps
            )
            wbar = jnp.moveaxis(wbar_cf, 1, -1)
            # w = a / max(sum a, eps):  abar = wbar/S - [sum>eps] <wbar, a>/S^2
            inner = jnp.sum(wbar * a, axis=-1, keepdims=True) / (s_m * s_m)
            abar = wbar / s_m - jnp.where(s_sum > eps, inner, 0.0)
            gbars.append(jnp.sign(g_raw) * abar)
            fbars.append(x0bar)
        return jnp.concatenate(gbars, axis=-1), jnp.stack(fbars, axis=-1)

    _, vjp = jax.vjp(
        lambda g, f: cspn_ref.cspn_nd_reference(g, f, kernel_size=3, steps=steps),
        guide,
        feat,
    )
    return vjp(ct)


_cspn3d_fused_vjp.defvjp(_cspn3d_fused_fwd, _cspn3d_fused_bwd)
