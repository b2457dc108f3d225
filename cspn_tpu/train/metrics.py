"""Depth metric suite (reference utils.py:19-57).

`evaluate_error` mirrors the reference exactly -- masked (gt > 1e-4) MSE,
RMSE (sqrt of the batch MSE), MAE, ABS_REL, threshold accuracies
delta < 1.02/1.05/1.10/1.25/1.25^2/1.25^3 via max(gt/pred, pred/gt) -- but as
a jittable masked reduction that runs on device (the reference pulls tensors
to CPU every step, train.py:204-206).  Adds iRMSE/iMAE (inverse-depth
metrics from the KITTI depth-completion benchmark / TPAMI paper; BASELINE
target) which the reference's own code never computed.

`LG10` is the standard NYU log10 error, mean |log10(gt) - log10(pred)| over
valid pixels with pred > 0.  The reference declares the key but never
computes it (utils.py:23-25, always 0); computing it is a deliberate upgrade
in the same spirit as iRMSE/iMAE.

`ErrorAverager` reproduces avg_error's batch-size-weighted accumulation
(utils.py:50-57), including its quirk of averaging per-batch RMSE values
(not sqrt of averaged MSE).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

VALID_THRESHOLD = 1e-4

METRIC_KEYS = (
    "MSE",
    "RMSE",
    "ABS_REL",
    "LG10",
    "MAE",
    "DELTA1.02",
    "DELTA1.05",
    "DELTA1.10",
    "DELTA1.25",
    "DELTA1.25^2",
    "DELTA1.25^3",
    "iRMSE",
    "iMAE",
)


def evaluate_error(gt_depth: jnp.ndarray, pred_depth: jnp.ndarray) -> dict:
    """Jittable metric dict over a batch. Shapes: any matching [..., H, W]."""
    mask = gt_depth > VALID_THRESHOLD
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    gt = jnp.where(mask, gt_depth, 1.0)
    pred = jnp.where(mask, pred_depth, 1.0)

    diff = jnp.abs(gt - pred)
    mse = jnp.sum(diff**2 * m) / n
    mae = jnp.sum(diff * m) / n
    rel = jnp.sum(diff / gt * m) / n
    ratio = jnp.maximum(gt / pred, pred / gt)

    def delta(t):
        return jnp.sum((ratio < t) & mask) / n

    # inverse-depth metrics in 1/km over valid pixels with pred > 0
    # (KITTI depth completion benchmark definition)
    pos = mask & (pred_depth > VALID_THRESHOLD)
    mp = pos.astype(jnp.float32)
    np_ = jnp.maximum(jnp.sum(mp), 1.0)
    igt = jnp.where(pos, 1.0 / jnp.where(pos, gt_depth, 1.0), 0.0)
    ipred = jnp.where(pos, 1.0 / jnp.where(pos, pred_depth, 1.0), 0.0)
    idiff = jnp.abs(igt - ipred)
    irmse = jnp.sqrt(jnp.sum(idiff**2 * mp) / np_)
    imae = jnp.sum(idiff * mp) / np_

    # LG10 over the same valid & pred>0 pixels (log10 of a non-positive
    # prediction is undefined; the NYU convention masks them out)
    lgt = jnp.log10(jnp.where(pos, gt_depth, 1.0))
    lpred = jnp.log10(jnp.where(pos, pred_depth, 1.0))
    lg10 = jnp.sum(jnp.abs(lgt - lpred) * mp) / np_

    return {
        "MSE": mse,
        "RMSE": jnp.sqrt(mse),
        "ABS_REL": rel,
        "LG10": lg10,
        "MAE": mae,
        "DELTA1.02": delta(1.02),
        "DELTA1.05": delta(1.05),
        "DELTA1.10": delta(1.10),
        "DELTA1.25": delta(1.25),
        "DELTA1.25^2": delta(1.25**2),
        "DELTA1.25^3": delta(1.25**3),
        "iRMSE": irmse,
        "iMAE": imae,
    }


class ErrorAverager:
    """Batch-size-weighted running average (reference avg_error, utils.py:50-57)."""

    def __init__(self):
        self.sums = {k: 0.0 for k in METRIC_KEYS}
        self.total = 0

    def update(self, error: dict, batch_size: int) -> dict:
        self.total += batch_size
        for k in METRIC_KEYS:
            self.sums[k] += float(error[k]) * batch_size
        return self.average

    @property
    def average(self) -> dict:
        t = max(self.total, 1)
        return {k: self.sums[k] / t for k in METRIC_KEYS}
