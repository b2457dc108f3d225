"""Resize ops (TPU equivalent of the Paddle fork's native `resize_trilinear`,
cspn_paddle/README.md:24,46).

XLA lowers `jax.image.resize` to fused gather/matmul kernels, so no custom
kernel is needed on TPU; these wrappers fix the channel-last layout and
half-pixel-center sampling convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """x: [N, H, W, C] -> [N, out_h, out_w, C]."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, *out_hw, c), method="linear")


def resize_trilinear(x: jnp.ndarray, out_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """x: [N, D, H, W, C] -> [N, *out_dhw, C] (trilinear interpolation)."""
    n = x.shape[0]
    c = x.shape[-1]
    return jax.image.resize(x, (n, *out_dhw, c), method="linear")
