"""Pure-jnp CSPN reference implementations (the correctness oracle).

Two families, matching the two ops in the reference repo:

1. `cspn2d_reference` -- the pytorch "naive" 2D CSPN
   (cspn_pytorch/models/cspn.py:42-172): padded-canvas affinity
   normalization, `(1 - gate_sum) * x0` center coupling to the *initial*
   depth, and per-step sparse anchoring.  Bit-compatible with the reference
   semantics except that 0/0 in the normalization is guarded to 0 (the
   reference would produce NaN there; reachable only if all eight neighbor
   gates are exactly zero).

2. `affinity_propagate_reference` / `cspn_nd_reference` -- the paddle native
   op + module wrapper (cspn_paddle/demo.py:20-54, contract at
   cspn_paddle/README.md:54-56): gates normalized per pixel outside the op,
   one gather step per call with center weight `1 - sum(gates)` (zero for
   abs-normalized gates), channel-shared gates, 2D or 3D.

Everything here is jit-able, differentiable (steps unrolled), and runs on
any backend.  The Pallas kernels in cspn_pallas.py are verified against these.

Layout convention: channels-LAST (TPU native).
    guidance: [N, *spatial, D] with D = kernel**ndim - 1
    depth/feat: [N, *spatial] (single channel, squeezed) for cspn2d;
                [N, *spatial, C] for the nd op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cspn_tpu.ops.neighbors import OFFSETS_2D_REFERENCE, neighbor_offsets, shift

_VALID_NORMS = ("8sum", "8sum_abs")


def normalize_affinity_2d(guidance: jnp.ndarray, norm_type: str = "8sum"):
    """Padded-canvas affinity normalization (cspn.py:85-144), gather form.

    Args:
        guidance: [N, H, W, 8] raw affinity head output, reference gate order.
        norm_type: '8sum' (signed affinities) or '8sum_abs' (abs first).

    Returns:
        gates:  [N, H, W, 8] normalized *pre-shifted* gates: gates[..., d]
                multiplies the depth value at `p + offset_d`.
        center: [N, H, W] center weight `1 - sum_d gates_d` (the reference's
                `1 - gate_sum`, cspn.py:75-76).

    The reference normalizes each canvas position by the abs-sum over the 8
    direction-shifted maps (cspn.py:134-138); in gather form this divisor is
    `sum_d |g_d[p + offset_d]|` with zero contribution for out-of-image
    neighbors, which reproduces the reference's border behavior exactly.
    """
    if norm_type not in _VALID_NORMS:
        raise ValueError(f"unknown norm_type {norm_type!r}; expected {_VALID_NORMS}")
    g = jnp.abs(guidance) if "abs" in norm_type else guidance
    shifted = jnp.stack(
        [shift(g[..., d], off, axes=(-2, -1)) for d, off in enumerate(OFFSETS_2D_REFERENCE)],
        axis=-1,
    )
    denom = jnp.sum(jnp.abs(shifted), axis=-1, keepdims=True)
    gates = jnp.where(denom > 0, shifted / jnp.where(denom > 0, denom, 1.0), 0.0)
    center = 1.0 - jnp.sum(gates, axis=-1)
    return gates, center


def propagate_2d(
    gates: jnp.ndarray,
    center: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_mask: jnp.ndarray | None,
    steps: int,
) -> jnp.ndarray:
    """Run `steps` propagation iterations with precomputed normalized gates.

    One step (cspn.py:66-82):
        x <- sum_d gates_d * x[p + offset_d] + center * x0
        x <- (1 - mask) * x + mask * x0        (sparse anchoring, if mask given)
    where x0 is the initial blur depth and mask = sign(sparse_depth).
    """

    x0 = blur_depth
    # unrolled (static) step count: XLA fuses across steps
    x = x0
    for _ in range(steps):
        y = center * x0
        for d, off in enumerate(OFFSETS_2D_REFERENCE):
            y = y + gates[..., d] * shift(x, off, axes=(-2, -1))
        if sparse_mask is not None:
            y = (1.0 - sparse_mask) * y + sparse_mask * x0
        x = y
    return x


def cspn2d_reference(
    guidance: jnp.ndarray,
    blur_depth: jnp.ndarray,
    sparse_depth: jnp.ndarray | None = None,
    *,
    steps: int = 24,
    norm_type: str = "8sum",
) -> jnp.ndarray:
    """Full 2D CSPN post-process, pytorch reference semantics (cspn.py:42-83).

    Args:
        guidance: [N, H, W, 8] affinity head output.
        blur_depth: [N, H, W] initial (blur) depth from the depth head.
        sparse_depth: optional [N, H, W] sparse observations; nonzero pixels
            are re-anchored to `blur_depth` after every step via
            mask = sign(sparse_depth) (cspn.py:63-64,80-81).
        steps: prop_time (reference default 24, train.py:46).
        norm_type: '8sum' | '8sum_abs'.
    """
    gates, center = normalize_affinity_2d(guidance, norm_type)
    mask = jnp.sign(sparse_depth) if sparse_depth is not None else None
    return propagate_2d(gates, center, blur_depth, mask, steps)


# --- parity helpers (reference cspn.py:175-194; unused by the reference's
# forward path but part of its public class surface) -----------------------


def normalize_gate(guidance: jnp.ndarray):
    """Two-gate abs-sum normalization (cspn.py:175-183): guidance [..., 2]
    split into two maps, each divided by |g1|+|g2|.  NB: like the reference,
    0/0 yields NaN here -- this helper reproduces its exact semantics."""
    g1, g2 = guidance[..., 0], guidance[..., 1]
    s = jnp.abs(g1) + jnp.abs(g2)
    return g1 / s, g2 / s


def max_of_4_tensor(e1, e2, e3, e4):
    """Elementwise max of four maps (cspn.py:186-189)."""
    return jnp.maximum(jnp.maximum(e1, e2), jnp.maximum(e3, e4))


def max_of_8_tensor(e1, e2, e3, e4, e5, e6, e7, e8):
    """Elementwise max of eight maps (cspn.py:191-194)."""
    return jnp.maximum(
        max_of_4_tensor(e1, e2, e3, e4), max_of_4_tensor(e5, e6, e7, e8)
    )


# ---------------------------------------------------------------------------
# Paddle-semantics native op (2D/3D), per-pixel normalized gates.
# ---------------------------------------------------------------------------


def affinity_propagate_reference(
    feat: jnp.ndarray,
    gate_weight: jnp.ndarray,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """One propagation step, paddle `affinity_propagate` semantics.

    Args:
        feat: [N, *spatial, C] feature map (spatial is 2- or 3-dimensional).
        gate_weight: [N, *spatial, k^ndim - 1] per-pixel gates, already
            normalized along the last dim (cspn_paddle/README.md:54); shared
            across the C feature channels (README.md:56).
        kernel_size: neighborhood size k (only 3 supported, demo.py:91).

    One step at pixel p (TPAMI formulation; gates gathered at p):
        out[p] = (1 - sum_d w_d[p]) * feat[p] + sum_d w_d[p] * feat[p + off_d]
    with zero contribution for out-of-image neighbors.  For abs-sum-normalized
    gates the center weight is 0 ("center affinity to be 0", cspn.py:27-28).
    """
    ndim = feat.ndim - 2
    offsets = neighbor_offsets(ndim, kernel_size)
    if gate_weight.shape[-1] != len(offsets):
        raise ValueError(
            f"gate_weight last dim {gate_weight.shape[-1]} != k^n-1 = {len(offsets)}"
        )
    axes = tuple(range(-ndim - 1, -1))  # spatial axes of feat [N, *S, C]
    out = (1.0 - jnp.sum(gate_weight, axis=-1))[..., None] * feat
    for d, off in enumerate(offsets):
        out = out + gate_weight[..., d : d + 1] * shift(feat, off, axes=axes)
    return out


def cspn_nd_reference(
    guide: jnp.ndarray,
    feat: jnp.ndarray,
    *,
    kernel_size: int = 3,
    steps: int = 24,
) -> jnp.ndarray:
    """Multi-step nd CSPN module, paddle demo semantics (demo.py:20-54).

    Args:
        guide: [N, *spatial, C * (k^n - 1)] raw guidance; abs() then
            sum-normalized per feature-channel group (demo.py:24,34-36).
        feat: [N, *spatial, C] features (e.g. a stereo cost-volume slice).
    """
    ndim = feat.ndim - 2
    n_gates = kernel_size**ndim - 1
    c = feat.shape[-1]
    if guide.shape[-1] != c * n_gates:
        raise ValueError(
            f"guide channels {guide.shape[-1]} != C*(k^n-1) = {c * n_gates}"
        )
    guide = jnp.abs(guide)
    offsets = neighbor_offsets(ndim, kernel_size)
    axes = tuple(range(-ndim - 1, -1))
    outs = []
    for ch in range(c):
        w = guide[..., ch * n_gates : (ch + 1) * n_gates]
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
        # hoist the center weight and unroll the (static) step count: XLA
        # fuses across unrolled steps, ~3x faster than the lax.scan form
        center = 1.0 - jnp.sum(w, axis=-1, keepdims=True)
        x = feat[..., ch : ch + 1]
        for _ in range(steps):
            y = center * x
            for d, off in enumerate(offsets):
                y = y + w[..., d : d + 1] * shift(x, off, axes=axes)
            x = y
        outs.append(x)
    return jnp.concatenate(outs, axis=-1)
