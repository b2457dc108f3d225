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
import jax
import jax.numpy as jnp

from cspn_tpu.models.resnet import BatchNorm, conv
from cspn_tpu.ops.cspn import cspn_nd
from cspn_tpu.ops.resize import resize_trilinear


class _ConvBnRelu(nn.Module):
    features: int
    stride: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, 3, self.stride, dtype=self.dtype)(x)
        x = BatchNorm(not self.train, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class StereoFeatureExtractor(nn.Module):
    """Small residual CNN, output stride 4, shared between views."""

    features: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        kw = dict(train=self.train, dtype=self.dtype)
        x = _ConvBnRelu(f, stride=2, **kw, name="stem1")(x)
        x = _ConvBnRelu(f, **kw, name="stem2")(x)
        x = _ConvBnRelu(2 * f, stride=2, **kw, name="down")(x)
        for i in range(2):  # residual refinement
            h = _ConvBnRelu(2 * f, **kw, name=f"res{i}a")(x)
            h = conv(2 * f, 3, dtype=self.dtype, name=f"res{i}b")(h)
            h = BatchNorm(not self.train, dtype=self.dtype, name=f"res{i}bn")(h)
            x = nn.relu(x + h)
        # no bn/relu on matching features
        return conv(f, 1, dtype=self.dtype, name="proj")(x)


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


def conv3d_batched2d(
    xf: jnp.ndarray,
    kernel: jnp.ndarray,
    d: int,
    stride: int = 1,
) -> jnp.ndarray:
    """3x3x3 conv over a FLATTENED volume [N*D, H, W, Cin] -> [N*(D/s), H/s, W/s, Cout].

    XLA's native 3D conv lowering on TPU runs at ~10% of the MXU (measured:
    14.4 ms for the 174-GFLOP stereo hourglass conv0, 0.88 ms peak-time).
    Here the D axis rides the 2D conv's BATCH dim and the three kd taps are
    folded into OUTPUT CHANNELS of one 2D conv (kernel [3,3,Cin,3*Cout] --
    full lane utilization even for the hourglass's 32-channel widths),
    followed by a D-shifted sum of the three tap groups:

        out[:, j] = Y_kd0[:, s*j-1] + Y_kd1[:, s*j] + Y_kd2[:, s*j+1]

    For stride 1 the shift is a one-slice batch pad + two static slices
    (measured faster than jnp.roll, whose wrapped slices XLA materializes),
    with cross-image leaks at D-boundaries masked to zero, so the whole
    post-conv mix is one elementwise fusion in the flat layout.
    Measured 14.4 -> ~2 ms on the conv0 shape; numerics match the native op
    to f32 conv tolerance (the three tap partial sums round to the compute
    dtype before the add, exactly like summing three convs).

    kernel: [3, 3, 3, Cin, Cout] (kd, kh, kw, i, o) -- same parameter shape
    and layout as flax nn.Conv's 3D kernel, so state dicts stay
    interchangeable with the native formulation.
    """
    co = kernel.shape[-1]
    kall = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=-1)
    y = jax.lax.conv_general_dilated(
        xf,
        kall,
        (stride, stride),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [N*D, H/s, W/s, 3*Cout]
    if stride == 1:
        # one-slice batch pad + static slices: measured faster than the
        # roll form (XLA materializes roll's wrapped slices separately)
        yp = jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
        b = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1, 1, 1), 0)
        up = jnp.where(b % d > 0, yp[:-2, ..., :co], 0)
        dn = jnp.where(b % d < d - 1, yp[2:, ..., 2 * co :], 0)
        return up + y[..., co : 2 * co] + dn
    if stride == 2:
        n = xf.shape[0] // d
        dp = (d - 1) // 2 + 1  # output depth, matches lax stride-2 pad-1
        y5 = y.reshape(n, d, *y.shape[1:])
        zero = jnp.zeros((n, 1, *y.shape[1:-1], co), y.dtype)
        up = jnp.concatenate(
            [zero, y5[:, 1 : 2 * dp - 1 : 2, ..., :co]], axis=1
        )
        mid = y5[:, ::2, ..., co : 2 * co]
        dn = y5[:, 1::2, ..., 2 * co :]
        if d % 2 == 0:
            out = up + mid + dn
        else:  # tap 2j+1 falls outside the volume for the last output slice
            out = up + mid + jnp.concatenate([dn, zero], axis=1)
        return out.reshape(n * dp, *y.shape[1:-1], co)
    raise ValueError(f"unsupported stride {stride}")


class _Kernel3d(nn.Module):
    """Parameter holder: a bare 3D conv kernel at this module's tree path
    (init matches nn.Conv's default lecun_normal), so fused multi-head convs
    keep checkpoint-compatible per-head parameters."""

    shape: tuple
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (
            nn.initializers.zeros_init()
            if self.zero_init
            else nn.initializers.lecun_normal()
        )
        return self.param("kernel", init, self.shape, jnp.float32)


class Conv3d(nn.Module):
    """Bias-free 3x3x3 conv on a flattened [N*D, H, W, C] volume via
    `conv3d_batched2d`; parameter-compatible with nn.Conv's 3D kernel."""

    features: int
    d: int
    stride: int = 1
    dtype: object = None
    kernel_init: object = nn.initializers.he_normal()

    @nn.compact
    def __call__(self, xf):
        k = self.param(
            "kernel",
            self.kernel_init,
            (3, 3, 3, xf.shape[-1], self.features),
            jnp.float32,
        )
        if self.dtype is not None:
            xf = xf.astype(self.dtype)
            k = k.astype(self.dtype)
        return conv3d_batched2d(xf, k, self.d, self.stride)


class Hourglass3D(nn.Module):
    """3D conv encoder-decoder over [N, D, H, W, C].

    All stride-1 and stride-2 convs run as batched 2D convs on the
    flattened [N*D, H, W, C] layout (see conv3d_batched2d); the volume only
    takes 5-D form for the trilinear upsamples.  Parameter tree is identical
    to the native nn.Conv formulation.
    """

    features: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        n, d, h, w, _ = x.shape

        def bn(name):
            return BatchNorm(not self.train, dtype=self.dtype, name=name)

        def flat(v):
            return v.reshape(n * v.shape[1], *v.shape[2:])

        def unflat(vf, dd):
            return vf.reshape(n, dd, *vf.shape[1:])

        half = lambda v: (v - 1) // 2 + 1  # lax stride-2 pad-1 output size
        d1s, d2s = (d, h, w), tuple(map(half, (d, h, w)))
        d4s = tuple(map(half, d2s))

        xf = flat(x)
        x0 = nn.relu(bn("bn0")(Conv3d(f, d, dtype=self.dtype, name="conv0")(xf)))
        d1 = nn.relu(bn("bn1")(Conv3d(2 * f, d, 2, dtype=self.dtype, name="down1")(x0)))
        d1 = nn.relu(bn("bn1b")(Conv3d(2 * f, d2s[0], dtype=self.dtype, name="conv1")(d1)))
        d2 = nn.relu(bn("bn2")(Conv3d(2 * f, d2s[0], 2, dtype=self.dtype, name="down2")(d1)))
        d2 = nn.relu(bn("bn2b")(Conv3d(2 * f, d4s[0], dtype=self.dtype, name="conv2")(d2)))
        u1 = flat(resize_trilinear(unflat(d2, d4s[0]), d2s))
        u1 = nn.relu(bn("bnu1")(Conv3d(2 * f, d2s[0], dtype=self.dtype, name="up1")(u1)) + d1)
        u0 = flat(resize_trilinear(unflat(u1, d2s[0]), d1s))
        u0 = nn.relu(bn("bnu0")(Conv3d(f, d, dtype=self.dtype, name="up0")(u0)) + x0)
        return unflat(u0, d)


class PSMNetCSPN(nn.Module):
    """Stereo disparity network with 3D-CSPN cost refinement."""

    max_disp: int = 192
    features: int = 32
    cspn_steps: int = 24
    use_cspn: bool = True
    train: bool = False
    # bf16 mixed precision: conv/BN compute and activations (incl. the cost
    # volume, the memory-heavy tensor) in bf16, params f32, CSPN refinement
    # and disparity regression in f32 -- same convention as the 2D model
    dtype: object = None
    # a jax.sharding.Mesh with 'data'/'spatial' axes: the 3D CSPN refinement
    # runs with the cost volume's D axis sharded over 'spatial' and K-step
    # halo exchange over ICI (parallel/halo.py, BASELINE config 5)
    spatial_mesh: object = None
    spatial_halo: object = None  # None = cost-model-chosen K
    # zero-init the 26-gate guidance head: zero gates make the propagation
    # an EXACT identity at init (out = (1 - sum w) x + sum w x_nb, w = 0).
    # Default OFF: the op's per-pixel sum-normalization (cspn_nd, paddle
    # semantics) makes gate magnitude structural -- normalized gates are
    # O(1) for ANY nonzero head output -- so zero is a measure-zero
    # identity point and the first optimizer step jumps to full-strength
    # smoothing with one-noisy-gradient directions (measured WORSE than
    # lecun init in the staged fine-tune ablation, see
    # scripts/stereo_refinement_ablation.py).  Kept as an option for op
    # variants without scale normalization.
    guidance_zero_init: bool = False

    @nn.compact
    def __call__(self, left, right):
        n, h, w, _ = left.shape
        num_disp4 = self.max_disp // 4
        if self.dtype is not None:
            left = left.astype(self.dtype)
            right = right.astype(self.dtype)
        extractor = StereoFeatureExtractor(
            self.features, self.train, self.dtype, name="feature"
        )
        fl = extractor(left)
        fr = extractor(right)

        cost = build_cost_volume(fl, fr, num_disp4)  # [N, D/4, H/4, W/4, 2C]
        cost = Hourglass3D(
            self.features, self.train, self.dtype, name="hourglass"
        )(cost)

        # cost head (1 ch) and 26-neighbor guidance head run as ONE fused
        # 27-channel batched-2D conv: separately, XLA pads each tiny output
        # channel count to full lanes (measured 4.4 + 7.7 ms at the PSMNet
        # protocol shape); the parameters stay two distinct kernels at their
        # original tree paths so state dicts remain interchangeable.
        cin = cost.shape[-1]
        wk = _Kernel3d((3, 3, 3, cin, 1), name="cost_head")()
        if self.use_cspn:
            wg = _Kernel3d((3, 3, 3, cin, 26), zero_init=self.guidance_zero_init,
                           name="guidance3d_head")()
            wk = jnp.concatenate([wk, wg], axis=-1)
        costf = cost.reshape(n * num_disp4, *cost.shape[2:])
        if self.dtype is not None:
            wk = wk.astype(self.dtype)
        heads = conv3d_batched2d(costf, wk, num_disp4)
        heads = heads.reshape(n, num_disp4, *cost.shape[2:4], heads.shape[-1])
        logits = heads[..., :1].astype(jnp.float32)

        if self.use_cspn:
            guide = heads[..., 1:].astype(jnp.float32)
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
    """Stereo metrics over valid pixels (0 < gt < max_disp):
    EPE (mean abs disparity error), >3px error rate, and D1 (the KITTI
    convention: wrong if the error is BOTH > 3 px AND > 5% of the true
    disparity)."""
    mask = (gt > 0) & (gt < max_disp)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    d = jnp.abs(pred - gt)
    return {
        "EPE": jnp.sum(d * m) / n,
        "3px": jnp.sum(((d > 3.0) & mask).astype(jnp.float32)) / n,
        "D1": jnp.sum(((d > 3.0) & (d > 0.05 * gt) & mask).astype(jnp.float32)) / n,
    }
