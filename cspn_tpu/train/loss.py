"""Losses (reference loss.py).

The reference trains with masked mean-L1 (`Wighted_L1_Loss`, loss.py:16-23):
valid pixels are label > 1e-4; loss = sum|pred - label| / n_valid.  berHu
(from the TPAMI paper; BASELINE config 2) is provided as an option.

Both are jittable masked reductions (no boolean indexing -> static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

VALID_THRESHOLD = 1e-4


def masked_l1_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Masked mean absolute error over valid (label > 1e-4) pixels."""
    mask = (label > VALID_THRESHOLD).astype(pred.dtype)
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.abs(pred - label) * mask) / n_valid


def berhu_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Reverse-Huber: L1 below threshold c, (d^2 + c^2) / (2c) above,
    c = 0.2 * max|d| over valid pixels (TPAMI Eq. choice)."""
    mask = (label > VALID_THRESHOLD).astype(pred.dtype)
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    diff = jnp.abs(pred - label) * mask
    c = jnp.maximum(0.2 * jnp.max(diff), 1e-6)
    per_px = jnp.where(diff <= c, diff, (diff**2 + c**2) / (2.0 * c))
    return jnp.sum(per_px * mask) / n_valid
