"""Eval image dumping (reference utils.save_eval_img, utils.py:182-209).

Writes %05d_{input,gt,pred}.png into <model_dir>/eval_result. Depth maps are
scaled for visualization like the reference: x25.5 for NYU, x1.0 for KITTI
(utils.py:198-206), clipped to uint8 grayscale.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from cspn_tpu.data.transforms import unnormalize

_DEPTH_VIS_SCALE = {"nyudepth": 25.5, "kitti": 1.0, "synthetic": 25.5}


def _to_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(x, 0.0, 255.0).astype(np.uint8)


def save_eval_images(
    dataset: str,
    model_dir: str,
    index: int,
    rgb: np.ndarray,  # [H, W, 3]; normalized unless raw=True
    gt_depth: np.ndarray,  # [H, W]
    pred_depth: np.ndarray,  # [H, W]
    raw: bool = False,
) -> str:
    folder = os.path.join(model_dir, "eval_result")
    os.makedirs(folder, exist_ok=True)
    scale = _DEPTH_VIS_SCALE.get(dataset, 1.0)
    rgb_arr = rgb if raw else unnormalize(rgb)
    Image.fromarray(_to_u8(rgb_arr * 255.0)).save(
        os.path.join(folder, "%05d_input.png" % index)
    )
    Image.fromarray(_to_u8(gt_depth * scale), mode="L").save(
        os.path.join(folder, "%05d_gt.png" % index)
    )
    save_pred_image(dataset, folder, index, pred_depth)
    return folder


def save_pred_image(
    dataset: str, folder: str, index: int, pred_depth: np.ndarray
) -> str:
    """Prediction-only dump (the `infer` CLI path: no gt/input to pair)."""
    os.makedirs(folder, exist_ok=True)
    scale = _DEPTH_VIS_SCALE.get(dataset, 1.0)
    path = os.path.join(folder, "%05d_pred.png" % index)
    Image.fromarray(_to_u8(pred_depth * scale), mode="L").save(path)
    return path
