"""Stereo matching with 3D CSPN cost-volume refinement.

The reference describes (but never released) a PSMNet-style stereo network
whose cost volume is refined by the native 3D `affinity_propagate` op
(cspn_paddle/README.md:16, commented usage :104-151: `--model=stereo
--stereoType=cspn`; BASELINE config 5).  This module provides that
capability TPU-natively:

  left/right [N,H,W,3]
    -> shared 2D feature extractor (stride 4)             [N,H/4,W/4,C]
    -> concat cost volume over D/4 disparities            [N,D/4,H/4,W/4,2C]
    -> 3D conv regularization (hourglass)                 [N,D/4,H/4,W/4,1]
    -> 3D CSPN refinement (26-neighbor, paddle semantics,
       gates from a 3D guidance branch; ops/cspn_ref.py)  [N,D/4,H/4,W/4,1]
    -> trilinear upsample (ops/resize.py)                 [N,D,H,W]
    -> softmax disparity regression                       [N,H,W]

All shapes static; the D dimension is the memory-heavy "long context" axis
that the spatial-sharding layer partitions for multi-chip runs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cspn_tpu.models.resnet import BatchNorm, conv
from cspn_tpu.ops.cspn import cspn_nd
from cspn_tpu.ops.resize import resize_trilinear


class _ConvBnRelu(nn.Module):
    features: int
    stride: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, 3, self.stride)(x)
        x = BatchNorm(not self.train, name="bn")(x)
        return nn.relu(x)


class StereoFeatureExtractor(nn.Module):
    """Small residual CNN, output stride 4, shared between views."""

    features: int = 32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.features
        x = _ConvBnRelu(f, stride=2, train=self.train, name="stem1")(x)
        x = _ConvBnRelu(f, train=self.train, name="stem2")(x)
        x = _ConvBnRelu(2 * f, stride=2, train=self.train, name="down")(x)
        for i in range(2):  # residual refinement
            h = _ConvBnRelu(2 * f, train=self.train, name=f"res{i}a")(x)
            h = conv(2 * f, 3, name=f"res{i}b")(h)
            h = BatchNorm(not self.train, name=f"res{i}bn")(h)
            x = nn.relu(x + h)
        return conv(f, 1, name="proj")(x)  # no bn/relu on matching features


def build_cost_volume(fl: jnp.ndarray, fr: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Concatenation cost volume (PSMNet style).

    fl, fr: [N, H, W, C] left/right features.
    Returns [N, num_disp, H, W, 2C]; at disparity d the right features are
    shifted right by d (zeros where the match would fall outside the image).
    """
    n, h, w, c = fl.shape
    slices = []
    for d in range(num_disp):
        if d == 0:
            fr_d = fr
        else:
            fr_d = jnp.pad(fr[:, :, : w - d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(jnp.concatenate([fl, fr_d], axis=-1))
    return jnp.stack(slices, axis=1)


class Hourglass3D(nn.Module):
    """3D conv encoder-decoder over [N, D, H, W, C]."""

    features: int
    train: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.features

        def c3(feats, stride=1, name=None):
            return nn.Conv(
                feats,
                (3, 3, 3),
                strides=(stride,) * 3,
                padding=((1, 1),) * 3,
                use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                name=name,
            )

        def bn(name):
            return BatchNorm(not self.train, name=name)

        x0 = nn.relu(bn("bn0")(c3(f, name="conv0")(x)))
        d1 = nn.relu(bn("bn1")(c3(2 * f, 2, name="down1")(x0)))
        d1 = nn.relu(bn("bn1b")(c3(2 * f, name="conv1")(d1)))
        d2 = nn.relu(bn("bn2")(c3(2 * f, 2, name="down2")(d1)))
        d2 = nn.relu(bn("bn2b")(c3(2 * f, name="conv2")(d2)))
        u1 = resize_trilinear(d2, d1.shape[1:4])
        u1 = nn.relu(bn("bnu1")(c3(2 * f, name="up1")(u1)) + d1)
        u0 = resize_trilinear(u1, x0.shape[1:4])
        u0 = nn.relu(bn("bnu0")(c3(f, name="up0")(u0)) + x0)
        return u0


class PSMNetCSPN(nn.Module):
    """Stereo disparity network with 3D-CSPN cost refinement."""

    max_disp: int = 192
    features: int = 32
    cspn_steps: int = 24
    use_cspn: bool = True
    train: bool = False
    # a jax.sharding.Mesh with 'data'/'spatial' axes: the 3D CSPN refinement
    # runs with the cost volume's D axis sharded over 'spatial' and K-step
    # halo exchange over ICI (parallel/halo.py, BASELINE config 5)
    spatial_mesh: object = None
    spatial_halo: int = 4

    @nn.compact
    def __call__(self, left, right):
        n, h, w, _ = left.shape
        num_disp4 = self.max_disp // 4
        extractor = StereoFeatureExtractor(self.features, self.train, name="feature")
        fl = extractor(left)
        fr = extractor(right)

        cost = build_cost_volume(fl, fr, num_disp4)  # [N, D/4, H/4, W/4, 2C]
        cost = Hourglass3D(self.features, self.train, name="hourglass")(cost)

        logits = nn.Conv(
            1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False, name="cost_head"
        )(cost)

        if self.use_cspn:
            # 26-neighbor guidance from the regularized volume features
            guide = nn.Conv(
                26, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                name="guidance3d_head",
            )(cost)
            if self.spatial_mesh is not None:
                from cspn_tpu.parallel.halo import cspn_nd_spatial

                logits = cspn_nd_spatial(
                    guide,
                    logits,
                    mesh=self.spatial_mesh,
                    kernel_size=3,
                    steps=self.cspn_steps,
                    halo=self.spatial_halo,
                )
            else:
                logits = cspn_nd(guide, logits, kernel_size=3, steps=self.cspn_steps)

        full = resize_trilinear(logits, (self.max_disp, h, w))[..., 0]
        # softmax disparity regression over the D axis
        probs = nn.softmax(full, axis=1)
        disp_values = jnp.arange(self.max_disp, dtype=jnp.float32)[None, :, None, None]
        return jnp.sum(probs * disp_values, axis=1)


def smooth_l1_disparity_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, max_disp: float
) -> jnp.ndarray:
    """Masked smooth-L1 (valid: 0 < gt < max_disp), PSMNet training loss."""
    mask = ((gt > 0) & (gt < max_disp)).astype(pred.dtype)
    n = jnp.maximum(mask.sum(), 1.0)
    d = jnp.abs(pred - gt)
    per_px = jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    return jnp.sum(per_px * mask) / n


def end_point_error(pred: jnp.ndarray, gt: jnp.ndarray, max_disp: float) -> dict:
    """Stereo metrics: EPE and >3px error rate over valid pixels."""
    mask = (gt > 0) & (gt < max_disp)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    d = jnp.abs(pred - gt)
    return {
        "EPE": jnp.sum(d * m) / n,
        "3px": jnp.sum(((d > 3.0) & mask).astype(jnp.float32)) / n,
    }
