"""Spatially-sharded CSPN with halo exchange (SURVEY.md §5 long-context plan).

The reference handles scale by cropping images to fit one GPU
(228x304 / 228x912 crops).  Here the image's H dimension is sharded over the
'spatial' mesh axis and the 24-step recurrence runs blockwise: each CSPN step
only needs a 1-pixel neighborhood, so a halo of width K lets every device run
K steps locally before exchanging K boundary rows with its mesh neighbors
over ICI (`jax.lax.ppermute`).  This is the propagation-network analog of
ring-attention/context-parallelism.

Correctness notes:
  - gate normalization needs a 1-row guidance halo, so guidance is exchanged
    with width K+1 and the normalized gates cropped to the K-extended block;
  - `ppermute` zero-fills edge devices, which exactly reproduces the
    reference's zero-padding at global image borders (cspn.py:104-129);
  - halo rows run the same update as interior rows; their outermost K rows
    accumulate error at 1 row/step, so after K steps the interior is exact
    (verified against the unsharded oracle in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cspn_tpu.ops.cspn_ref import normalize_affinity_2d
from cspn_tpu.ops.neighbors import OFFSETS_2D_REFERENCE, neighbor_offsets, shift


# --- halo-width autotune (docs/SCALING.md cost model 2, wired in) ----------
#
# Per segment of K local steps the device pays: redundant stencil compute on
# the 2K halo rows, one HBM reload of the (gates + base/keep + state) planes
# for the fused segment kernel, a kernel launch, and one ppermute pair.
# Measured v5e constants (scripts/kernel_roofline.py, scripts/vpu_probe.py):

_T2D_STEP_S_PER_PX = 7.5e-12   # fused 2D segment, per pixel-step
_T3D_STEP_S_PER_VOX = 22e-12   # fused 3D whole-volume schedule
_HBM_BPS = 819e9               # v5e HBM
_ICI_BPS = 45e9                # v5e per-link, per direction
_ICI_LAT_S = 2e-6
_SEG_LAUNCH_S = 5e-6


def choose_halo(
    steps: int,
    shard_extent: int,
    plane_px: int,
    batch: int,
    *,
    n_gate_planes: int = 8,
    t_step: float = _T2D_STEP_S_PER_PX,
    allowed=None,
) -> int:
    """Pick the halo width K minimizing the per-device segment cost model.

    shard_extent: local length of the sharded axis (rows for 2D, D for 3D);
    plane_px: pixels per unit of the sharded axis (W for 2D, H*W for 3D).
    Evaluates T(K) = compute(extended block, all steps) + rounds * (gate
    reload + launch + ppermute) over K in [1, min(steps, shard_extent-1)]
    (a halo can only reach the immediate mesh neighbor).

    allowed: optional predicate on K.  Training passes the fused-backward
    VMEM fit here: a K whose backward doesn't fit falls back to composed
    remat, which measures slower than a smaller fused K (KITTI shard:
    K=24 composed 6.6 ms vs K=8 fused 5.6 ms per chip,
    result/halo_bwd_bench.json).  If NO K satisfies the predicate the
    constraint is dropped rather than failing.
    """
    k_max = max(1, min(steps, shard_extent - 1))
    ks = list(range(1, k_max + 1))
    if allowed is not None:
        fitting = [k for k in ks if allowed(k)]
        ks = fitting or ks
    best_k, best_t = ks[0], float("inf")
    for k in ks:
        rounds = -(-steps // k)
        ext = shard_extent + 2 * k
        compute = steps * ext * plane_px * batch * t_step
        reload = (n_gate_planes + 3) * ext * plane_px * batch * 4 / _HBM_BPS
        comm = _ICI_LAT_S + 2 * k * plane_px * batch * 4 / _ICI_BPS
        t = compute + rounds * (reload + _SEG_LAUNCH_S + comm)
        if t < best_t:
            best_k, best_t = k, t
    return best_k


def _exchange_halos(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """Extend rows (axis 1) of a local block with k rows from each mesh
    neighbor; zero-filled at the ends (global image border)."""
    size = lax.axis_size(axis_name)
    if size == 1 or k == 0:
        pads = [(0, 0)] * x.ndim
        pads[1] = (k, k)
        return jnp.pad(x, pads)
    down = [(i, i + 1) for i in range(size - 1)]  # receive prev's bottom rows
    up = [(i + 1, i) for i in range(size - 1)]  # receive next's top rows
    top_halo = lax.ppermute(x[:, -k:], axis_name, down)
    bottom_halo = lax.ppermute(x[:, :k], axis_name, up)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=1)


def _local_cspn(
    guidance, blur, sparse, *, steps: int, norm_type: str, halo: int,
    axis_name: str, fused: bool = True, training: bool = False,
):
    """Per-device block compute. guidance [n, h, W, 8]; blur/sparse [n, h, W].

    The k-step local segments between halo exchanges run as a fused Pallas
    kernel (ops.cspn_pallas.cspn2d_halo_segment: one HBM round-trip per
    segment instead of per step, fused in-VMEM backward when it fits).
    fused=False keeps the composed XLA stencil.
    """
    if halo is None:  # model-chosen K (choose_halo cost model)
        allowed = None
        if training and fused:
            from cspn_tpu.ops.cspn_pallas import halo_bwd_fits_vmem

            ext, w = guidance.shape[1], guidance.shape[2]
            allowed = lambda k: halo_bwd_fits_vmem(ext + 2 * k, w, k)
        halo = choose_halo(
            steps, guidance.shape[1], guidance.shape[2], guidance.shape[0],
            allowed=allowed,
        )
    # a halo (and the +1 gate halo) can only reach the immediate mesh
    # neighbor, so it is capped by the local block height
    k = max(1, min(halo, guidance.shape[1] - 1))
    g_ext = _exchange_halos(guidance, k + 1, axis_name)
    gates, center = normalize_affinity_2d(g_ext, norm_type)
    gates, center = gates[:, 1:-1], center[:, 1:-1]  # valid on the k-extended block

    x0 = _exchange_halos(blur, k, axis_name)
    if sparse is not None:
        mask = jnp.sign(_exchange_halos(sparse, k, axis_name))
        keep = 1.0 - mask
        base = keep * center * x0 + mask * x0
    else:
        keep = None
        base = center * x0

    if fused:
        from cspn_tpu.ops.cspn_pallas import cspn2d_halo_segment

        gates_cf = jnp.moveaxis(gates, -1, 1)  # [n, 8, he, W], once

        def run_segment(x, k_this):
            return cspn2d_halo_segment(gates_cf, base, keep, x, k_this)

    else:

        def step_fn(x):
            xs = jnp.stack(
                [shift(x, off, axes=(-2, -1)) for off in OFFSETS_2D_REFERENCE],
                axis=-1,
            )
            y = jnp.sum(gates * xs, axis=-1)
            if keep is not None:
                y = keep * y
            return y + base

        def run_segment(x, k_this):
            for _ in range(k_this):
                x = step_fn(x)
            return x

    x = x0
    done = 0
    while done < steps:
        if done > 0:  # refresh halo rows from neighbors' interiors
            x = _exchange_halos(x[:, k:-k] if k else x, k, axis_name)
        k_this = min(k, steps - done) if k else steps
        x = run_segment(x, k_this if k else steps)
        done += k_this if k else steps
    return x[:, k:-k] if k else x


def cspn2d_spatial(
    guidance: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None = None,
    *,
    mesh: Mesh,
    steps: int = 24,
    norm_type: str = "8sum",
    halo: int | None = None,
    data_axis: str = "data",
    spatial_axis: str = "spatial",
    fused: bool = True,
    training: bool = False,
):
    """2D CSPN with batch sharded over `data_axis` and image rows sharded
    over `spatial_axis`.  Semantics identical to ops.cspn2d.

    Requires N % mesh['data'] == 0 and H % mesh['spatial'] == 0.
    halo=None picks K per shard shape from the measured cost model
    (choose_halo; training=True restricts to Ks whose fused backward fits
    VMEM -- result/halo_bwd_bench.json); fused=False keeps the
    composed-XLA local segments.
    """
    has_sparse = sparse_depth is not None
    spec_g = P(data_axis, spatial_axis, None, None)
    spec_x = P(data_axis, spatial_axis, None)

    fn = functools.partial(
        _local_cspn,
        steps=steps,
        norm_type=norm_type,
        halo=halo,
        axis_name=spatial_axis,
        fused=fused,
        training=training,
    )

    if has_sparse:
        local = lambda g, b, s: fn(g, b, s)
        in_specs = (spec_g, spec_x, spec_x)
        args = (guidance, blur_depth, sparse_depth)
    else:
        local = lambda g, b: fn(g, b, None)
        in_specs = (spec_g, spec_x)
        args = (guidance, blur_depth)

    # check_vma=False: pallas_call in interpret mode (CPU tests) lowers to
    # dynamic_slice ops that mix varying and replicated values, which the
    # vma checker rejects (JAX suggests this workaround); correctness is
    # pinned by the sharded-vs-unsharded equivalence tests
    return shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=spec_x, check_vma=False
    )(*args)


def _seg_nd_ref_cf(w_cf, x, k_steps, offsets, axes):
    """Composed reference for one local nd segment (channel-FIRST gates
    [n, n_gates, *spatial]): y = (1-sum w)*x + sum_d w_d * shift(x) iterated
    k_steps (paddle per-pixel semantics); the fused segment's backward
    rematerializes through this."""
    center = 1.0 - jnp.sum(w_cf, axis=1)
    for _ in range(k_steps):
        y = center * x
        for d, off in enumerate(offsets):
            y = y + w_cf[:, d] * shift(x, off, axes=axes)
        x = y
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _halo3_segment(w_cf, x, k_steps):
    """k_steps of 26-gate 3D propagation on one local block, fused.

    w_cf: [n, 26, d_ext, H, W] per-pixel normalized gates (channel-first so
    the relayout happens ONCE per call site, not per segment); x:
    [n, d_ext, H, W].  Forward runs the whole-volume Pallas schedule
    (cspn3d_pallas; gates read from HBM once per segment); backward
    rematerializes through the composed form (exact adjoint, incl. the
    center term's dependence on the gates).
    """
    from cspn_tpu.ops import cspn3d_pallas

    # f32 gates: local blocks are small, and the sharded op then matches
    # the f32 oracle exactly (the unsharded fast path's bf16-resident gates
    # trade ~5e-5 error for half the gate traffic)
    return cspn3d_pallas.affinity_propagate3d_fused(
        x, w_cf, steps=k_steps, gate_dtype=jnp.float32
    )


def _halo3_segment_fwd(w_cf, x, k_steps):
    return _halo3_segment(w_cf, x, k_steps), (w_cf, x)


def _halo3_segment_bwd(k_steps, residuals, ct):
    w_cf, x = residuals
    from cspn_tpu.ops import cspn3d_pallas

    n, _, d_sz, h, w = w_cf.shape
    if cspn3d_pallas.bwd3_fits_vmem(d_sz, h, w, k_steps, gate_bytes=4):
        # fused in-VMEM replay + adjoint sweep (cspn3d_pallas._bwd3_kernel);
        # f32-resident gates so the sharded path keeps matching the f32
        # oracle exactly (same reason as the forward segment above)
        return cspn3d_pallas.affinity_propagate3d_fused_bwd(
            x, w_cf, ct, steps=k_steps, gate_dtype=jnp.float32
        )
    offsets = neighbor_offsets(3, 3)
    _, vjp = jax.vjp(
        lambda w, xx: _seg_nd_ref_cf(w, xx, k_steps, offsets, (-3, -2, -1)),
        w_cf, x,
    )
    return vjp(ct)


_halo3_segment.defvjp(_halo3_segment_fwd, _halo3_segment_bwd)


def _local_cspn_nd(
    guide, feat, *, kernel_size: int, steps: int, halo: int, axis_name: str,
    fused: bool = True,
):
    """Per-device block of the paddle-semantics nd CSPN (cspn_nd_reference).

    guide [n, d_loc, *rest, C*(k^n-1)], feat [n, d_loc, *rest, C]; the first
    spatial axis (axis 1) is the sharded one.  Normalization is per-pixel
    (demo.py:34-36), so unlike the 2D canvas form no +1 gate halo is needed:
    gates and features are exchanged with the same width K and each device
    runs K steps per exchange.  `ppermute` zero-fill at the mesh ends
    reproduces the zero contribution of out-of-volume neighbors.

    For 3D volumes (kernel 3) the k-step local segments run as the fused
    whole-volume Pallas schedule per channel (_halo3_segment); other ranks
    and fused=False use the composed XLA stencil.
    """
    ndim = feat.ndim - 2
    n_gates = kernel_size**ndim - 1
    c = feat.shape[-1]
    offsets = neighbor_offsets(ndim, kernel_size)
    axes = tuple(range(-ndim - 1, -1))
    if halo is None:  # model-chosen K
        import math

        halo = choose_halo(
            steps,
            feat.shape[1],
            math.prod(feat.shape[2 : 2 + ndim - 1]),
            feat.shape[0] * c,
            n_gate_planes=n_gates,
            t_step=_T3D_STEP_S_PER_VOX if ndim == 3 else _T2D_STEP_S_PER_PX,
        )
    k = max(1, min(halo, feat.shape[1] - 1))

    g = jnp.abs(guide)
    # normalize per feature-channel gate group (pointwise, pre-exchange)
    g = g.reshape(g.shape[:-1] + (c, n_gates))
    g = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-12)
    center = 1.0 - jnp.sum(g, axis=-1)  # [n, *spatial, C]

    w = _exchange_halos(g, k, axis_name)  # [n, d+2k, *rest, C, n_gates]
    center = _exchange_halos(center, k, axis_name)
    x = _exchange_halos(feat, k, axis_name)

    use_fused = fused and ndim == 3 and kernel_size == 3

    if use_fused:
        # relayout each channel's gate volume to channel-first ONCE (a
        # per-segment moveaxis measured ~2 ms/segment at the stereo shape)
        w_cf_by_ch = [
            jnp.moveaxis(w[..., ch, :], -1, 1) for ch in range(c)
        ]

        def run_segment(x, k_this):
            outs = [
                _halo3_segment(w_cf_by_ch[ch], x[..., ch], k_this)
                for ch in range(c)
            ]
            return jnp.stack(outs, axis=-1)

    else:

        def step_fn(x):
            y = center * x
            for d, off in enumerate(offsets):
                y = y + w[..., d] * shift(x, off, axes=axes)
            return y

        def run_segment(x, k_this):
            for _ in range(k_this):
                x = step_fn(x)
            return x

    done = 0
    while done < steps:
        if done > 0:
            x = _exchange_halos(x[:, k:-k], k, axis_name)
        k_this = min(k, steps - done)
        x = run_segment(x, k_this)
        done += k_this
    return x[:, k:-k]


def cspn_nd_spatial(
    guide: jnp.ndarray,
    feat: jnp.ndarray,
    *,
    mesh: Mesh,
    kernel_size: int = 3,
    steps: int = 24,
    halo: int | None = None,
    data_axis: str = "data",
    spatial_axis: str = "spatial",
    fused: bool = True,
):
    """Paddle-semantics nd CSPN (ops.cspn_nd) with the batch sharded over
    `data_axis` and the first spatial axis (D for cost volumes) sharded over
    `spatial_axis` with K-step halo exchange over ICI.

    This is the multi-host path for 3D CSPN over stereo cost volumes
    (BASELINE config 5): a [N, D, H, W, C] volume too large for one chip's
    HBM is split along D; each of the `steps` propagation iterations needs a
    1-voxel neighborhood, so a width-K halo amortizes one `ppermute` pair
    per K steps.

    Requires N % mesh['data'] == 0 and D % mesh['spatial'] == 0.
    Semantics identical to ops.cspn_nd (verified in tests/test_parallel.py).
    """
    spec_g = P(data_axis, spatial_axis, *([None] * (guide.ndim - 2)))
    spec_f = P(data_axis, spatial_axis, *([None] * (feat.ndim - 2)))

    fn = functools.partial(
        _local_cspn_nd,
        kernel_size=kernel_size,
        steps=steps,
        halo=halo,
        axis_name=spatial_axis,
        fused=fused,
    )
    # check_vma=False: see cspn2d_spatial (pallas-in-shard_map limitation)
    return shard_map(
        fn, mesh=mesh, in_specs=(spec_g, spec_f), out_specs=spec_f,
        check_vma=False,
    )(guide, feat)
