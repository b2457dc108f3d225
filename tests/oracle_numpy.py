"""Independent numpy transcription of the reference CSPN algorithms.

Used ONLY as a test oracle.  This follows the *padded-canvas* formulation of
cspn_pytorch/models/cspn.py literally (zero-padded direction-shifted canvases,
canvas-position normalization, crop), i.e. a different code path from the
gather-form implementation in cspn_tpu/ops -- so agreement between the two is
a meaningful check of the reformulation.

Layout here is NCHW-like to mirror the reference: guidance [N, 8, H, W],
depth [N, H, W].
"""

import numpy as np

# (left, right, top, bottom) zero-pad per gate, reference order (cspn.py:104-129)
_PADS = [
    (0, 2, 0, 2),  # gate1 left-top
    (1, 1, 0, 2),  # gate2 center-top
    (2, 0, 0, 2),  # gate3 right-top
    (0, 2, 1, 1),  # gate4 left-center
    (2, 0, 1, 1),  # gate5 right-center
    (0, 2, 2, 0),  # gate6 left-bottom
    (1, 1, 2, 0),  # gate7 center-bottom
    (2, 0, 2, 0),  # gate8 right-bottom
]


def _pad8(x):
    """x [N, H, W] -> [N, 8, H+2, W+2], each channel zero-padded at its offset."""
    n, h, w = x.shape
    out = np.zeros((n, 8, h + 2, w + 2), dtype=x.dtype)
    for d, (l, r, t, b) in enumerate(_PADS):
        out[:, d, t : t + h, l : l + w] = x
    return out


def affinity_normalization(guidance, norm_type):
    """guidance [N, 8, H, W] -> (gate_wb [N,8,H+2,W+2], gate_sum [N,H,W])."""
    if "abs" in norm_type:
        guidance = np.abs(guidance)
    n, _, h, w = guidance.shape
    gate_wb = np.zeros((n, 8, h + 2, w + 2), dtype=guidance.dtype)
    for d, (l, r, t, b) in enumerate(_PADS):
        gate_wb[:, d, t : t + h, l : l + w] = guidance[:, d]
    abs_weight = np.abs(gate_wb).sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        gate_wb = np.where(abs_weight > 0, gate_wb / abs_weight, 0.0)
    gate_sum = gate_wb.sum(axis=1)[:, 1:-1, 1:-1]
    return gate_wb, gate_sum


def cspn2d(guidance, blur_depth, sparse_depth=None, steps=24, norm_type="8sum"):
    """guidance [N,8,H,W], blur_depth [N,H,W] -> [N,H,W]."""
    gate_wb, gate_sum = affinity_normalization(guidance, norm_type)
    x0 = blur_depth
    x = blur_depth
    mask = np.sign(sparse_depth) if sparse_depth is not None else None
    for _ in range(steps):
        padded = _pad8(x)
        x = (gate_wb * padded).sum(axis=1)[:, 1:-1, 1:-1]
        x = (1.0 - gate_sum) * x0 + x
        if mask is not None:
            x = (1 - mask) * x + mask * x0
    return x


def affinity_propagate_nd(feat, gates, offsets):
    """One paddle-style step. feat [N,*S], gates [N,D,*S] per-pixel normalized.

    out[p] = (1 - sum_d g[d,p]) feat[p] + sum_d g[d,p] feat[p+off_d]
    """
    out = (1.0 - gates.sum(axis=1)) * feat
    nd = feat.ndim - 1
    for d, off in enumerate(offsets):
        shifted = feat
        for ax, o in enumerate(off):
            shifted = np.roll(shifted, -o, axis=1 + ax)
            # zero the wrapped region
            idx = [slice(None)] * shifted.ndim
            if o > 0:
                idx[1 + ax] = slice(shifted.shape[1 + ax] - o, None)
            elif o < 0:
                idx[1 + ax] = slice(0, -o)
            if o != 0:
                shifted[tuple(idx)] = 0
        out = out + gates[:, d] * shifted
    return out
