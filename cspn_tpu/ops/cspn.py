"""Public CSPN op API with backend dispatch.

Backends:
    'pallas'    -- fused TPU kernel (all steps in VMEM, one HBM read/write).
    'reference' -- pure jnp/lax.scan oracle (any backend, autodiff-native).
    'auto'      -- pallas on TPU, reference elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cspn_tpu.ops import cspn_ref


@functools.cache
def _default_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "reference"


def _resolve(backend: str) -> str:
    return _default_backend() if backend == "auto" else backend




def _round_io(guidance, blur_depth, sparse_depth, io_dtype):
    """Emulate the fused kernel's reduced-precision HBM I/O on paths that
    read f32: round the inputs through io_dtype (the kernel upcasts at
    first use, so this is the identical function).  One place, so every
    fallback shape class stays in lockstep (ADVICE r3)."""
    if io_dtype is None:
        return guidance, blur_depth, sparse_depth
    dt = jnp.dtype(io_dtype)
    return (
        guidance.astype(dt).astype(jnp.float32),
        blur_depth.astype(dt).astype(jnp.float32),
        None if sparse_depth is None else sparse_depth.astype(dt).astype(jnp.float32),
    )


def cspn2d(
    guidance: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None = None,
    *,
    steps: int = 24,
    norm_type: str = "8sum",
    backend: str = "auto",
    io_dtype=None,
) -> jnp.ndarray:
    """2D CSPN post-process (pytorch reference semantics). See cspn_ref.cspn2d_reference.

    io_dtype: opt-in HBM I/O dtype for the fused kernel (jnp.bfloat16
    halves its read traffic / input VMEM residency; arithmetic stays f32).
    The reference backend emulates it by rounding the inputs, which is the
    same function the kernel computes (it upcasts at first use).
    """
    backend = _resolve(backend)
    io_bytes = jnp.dtype(io_dtype).itemsize if io_dtype is not None else 4
    if backend == "pallas":
        from cspn_tpu.ops import cspn_pallas

        h, w = guidance.shape[-3], guidance.shape[-2]
        if cspn_pallas.fwd_fits_vmem(h, w, io_bytes):
            return cspn_pallas.cspn2d_pallas(
                guidance, blur_depth, sparse_depth, steps=steps,
                norm_type=norm_type, io_dtype=io_dtype,
            )
        if cspn_pallas.tiled_fwd_fits(h, w, steps):
            # image too large for the whole-image kernel's VMEM budget:
            # row-tiled fused path (all steps per tile in VMEM, steps-row
            # halos; ~1 normalize pass + ~1.2x one plane read/write of HBM
            # traffic instead of ~10 planes per step for composed XLA).
            # io_dtype is emulated by rounding the inputs (same function:
            # the kernels upcast at first use) rather than plumbed into the
            # tile DMAs: under bf16 I/O the whole-image kernel already
            # covers 2x704x1216, and the tiled path is ~90% VPU-compute-
            # bound (docs/SCALING.md), so halved DMA would buy <8% -- but
            # the rounding must still happen or this one shape class would
            # silently compute the full-f32 function while every other
            # io_dtype path (fused, reference/CPU) rounds.
            guidance, blur_depth, sparse_depth = _round_io(
                guidance, blur_depth, sparse_depth, io_dtype
            )
            return cspn_pallas.cspn2d_tiled(
                guidance, blur_depth, sparse_depth, steps=steps, norm_type=norm_type
            )
        backend = "reference"  # width beyond even the tiled VMEM budget
    if backend == "reference":
        guidance, blur_depth, sparse_depth = _round_io(
            guidance, blur_depth, sparse_depth, io_dtype
        )
        return cspn_ref.cspn2d_reference(
            guidance, blur_depth, sparse_depth, steps=steps, norm_type=norm_type
        )
    raise ValueError(f"unknown backend {backend!r}")


def affinity_propagate(
    feat: jnp.ndarray,
    gate_weight: jnp.ndarray,
    kernel_size: int = 3,
    *,
    backend: str = "auto",
) -> jnp.ndarray:
    """One propagation step (paddle native-op semantics), 2D or 3D."""
    # Single-step gather is fully fused by XLA already; the fused multi-step
    # path lives in cspn_nd / cspn2d.  Kept as its own entry point for parity
    # with paddle.fluid.layers.affinity_propagate.
    del backend
    return cspn_ref.affinity_propagate_reference(feat, gate_weight, kernel_size)


def cspn_nd(
    guide: jnp.ndarray,
    feat: jnp.ndarray,
    *,
    kernel_size: int = 3,
    steps: int = 24,
    backend: str = "auto",
) -> jnp.ndarray:
    """Multi-step 2D/3D CSPN module (paddle demo semantics)."""
    backend = _resolve(backend)
    if backend == "pallas":
        from cspn_tpu.ops import cspn_pallas

        return cspn_pallas.cspn_nd_pallas(
            guide, feat, kernel_size=kernel_size, steps=steps
        )
    if backend == "reference":
        return cspn_ref.cspn_nd_reference(
            guide, feat, kernel_size=kernel_size, steps=steps
        )
    raise ValueError(f"unknown backend {backend!r}")
