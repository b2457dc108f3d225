"""ResNet encoder for depth completion (reference L1 layer).

Flax/NHWC re-implementation of the encoder half of
cspn_pytorch/models/torch_resnet_cspn_nyu.py:
  - 4-channel RGBD stem: 7x7/s2 conv (torch_resnet_cspn_nyu.py:287),
  - BasicBlock (expansion 1, :56-85) and Bottleneck (expansion 4, :88-124),
  - stages layer1..layer4 (:292-295) with 1x1 strided downsample shortcuts
    (:321-336),
  - extra bottleneck conv2+bn2 at the end (:297-299, note: no ReLU, :366).

The encoder returns the skip maps the decoder consumes (forward :352-366):
  skip4 = stem conv output *before* BN/ReLU (:352-353),
  skip3 = layer1 output (:358-359), skip2 = layer2 output (:361-362).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class _TorchStatsBatchNorm(nn.Module):
    """flax ``nn.BatchNorm`` with torch's running-statistics semantics.

    Identical math to flax for normalization (biased batch variance, f32
    stats, same `_normalize` op order/dtype promotion — that logic is
    inlined below rather than imported from flax's private
    ``normalization._compute_stats``/``_normalize`` helpers, whose
    signatures change across releases), but the running-var update uses
    the UNBIASED batch variance (Bessel n/(n-1)) exactly like
    ``torch.nn.modules.batchnorm._BatchNorm.forward`` — flax updates with
    the biased variance, which drifts the running stats by n/(n-1) per
    step vs a torch-trained model.  Pinned against executed torch BN in
    tests/test_torch_oracle.py (full-model training-step parity)."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        import jax as _jax

        reduction_axes = tuple(range(x.ndim - 1))
        feature_shape = [x.shape[-1]]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32),
            feature_shape,
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32),
            feature_shape,
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # batch statistics at >= f32 (flax _compute_stats semantics:
            # promote, fast variance E[x^2]-E[x]^2 clipped at 0, one
            # stacked pmean across the data axis)
            stat_dtype = jnp.promote_types(
                jnp.result_type(x) if self.dtype is None else self.dtype,
                jnp.float32,
            )
            xs = x.astype(stat_dtype)
            mean = xs.mean(reduction_axes)
            mean2 = jnp.square(xs).mean(reduction_axes)
            axis_name = self.axis_name if not self.is_initializing() else None
            if axis_name is not None:
                mean, mean2 = _jax.lax.pmean(
                    jnp.stack([mean, mean2]), axis_name
                )
            var = jnp.maximum(0.0, mean2 - jnp.square(mean))
            if not self.is_initializing():
                n = 1.0
                for ax in reduction_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n = n * _jax.lax.psum(1.0, self.axis_name)
                bessel = n / (n - 1.0) if n > 1.0 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )
        # normalization (flax _normalize semantics: subtract/scale in the
        # promoted dtype, scale param folded into rsqrt, output dtype =
        # self.dtype or result_type(x, scale, bias))
        bshape = [1] * (x.ndim - 1) + feature_shape
        mean_b = mean.reshape(bshape)
        var_b = var.reshape(bshape)
        y = x - mean_b
        mul = _jax.lax.rsqrt(var_b + self.epsilon)
        scale = self.param(
            "scale", nn.initializers.ones, feature_shape, jnp.float32
        ).reshape(bshape)
        mul = mul * scale
        y = y * mul
        bias = self.param(
            "bias", nn.initializers.zeros, feature_shape, jnp.float32
        ).reshape(bshape)
        y = y + bias
        out_dtype = (
            jnp.result_type(x, scale, bias) if self.dtype is None else self.dtype
        )
        return jnp.asarray(y, out_dtype)


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1, unbiased
    running-var update).

    `dtype` is the compute/output dtype (bf16 for mixed precision); statistics
    and parameters stay float32.  The inner module is pinned to the name
    'BatchNorm_0' so parameter trees stay interchangeable with checkpoints
    produced when this wrapper nested a plain flax ``nn.BatchNorm``."""

    use_running_average: bool
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return _TorchStatsBatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x)


def conv(features: int, kernel: int, stride: int = 1, name: str | None = None,
         dtype=None, quant: bool = False):
    """Bias-free conv with torch-style symmetric padding.

    `dtype=jnp.bfloat16` runs the MXU in bf16 (params stay float32).
    `quant=True` runs dynamic-int8 serving quantization (utils/quant.py) —
    same 'kernel' parameter, s8 x s8 -> s32 execution on the MXU."""
    if quant:
        from cspn_tpu.utils.quant import QuantConv

        return QuantConv(features, kernel, stride, dtype=dtype, name=name)
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=nn.initializers.he_normal(),
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    axis_name: str | None = None
    dtype: object = None
    quant: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype, quant=self.quant)(x)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, name="conv2", dtype=self.dtype, quant=self.quant)(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        if self.downsample:
            residual = conv(self.planes, 1, self.stride, name="ds_conv", dtype=self.dtype, quant=self.quant)(x)
            residual = BatchNorm(not self.train, self.axis_name, self.dtype, name="ds_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    axis_name: str | None = None
    dtype: object = None
    quant: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv(self.planes, 1, name="conv1", dtype=self.dtype, quant=self.quant)(x)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, name="conv2", dtype=self.dtype, quant=self.quant)(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, name="conv3", dtype=self.dtype, quant=self.quant)(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn3")(out)
        if self.downsample:
            residual = conv(self.planes * 4, 1, self.stride, name="ds_conv", dtype=self.dtype, quant=self.quant)(x)
            residual = BatchNorm(not self.train, self.axis_name, self.dtype, name="ds_bn")(residual)
        return nn.relu(out + residual)


_BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck}


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], channel = (py*2+px)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _stem_s2d_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Reindex the 7x7/s2 stem kernel (HWIO) for a space-to-depth-packed
    input: a 4x4/s1 conv over [H/2, W/2, 4*cin] with padding (2,1).

    Output pixel i of the strided conv reads source rows u = 2i + a - 3,
    a in [0,6]; in packed coordinates u = 2(i+s) + p with s in [-2,1] and
    phase p, i.e. a = 2s + 3 + p (zero where a falls outside [0,6])."""
    k, _, cin, cout = w.shape
    assert k == 7
    w4 = jnp.zeros((4, 4, 4 * cin, cout), w.dtype)
    for si in range(4):
        for ti in range(4):
            s, t = si - 2, ti - 2
            for py in range(2):
                for px in range(2):
                    a, b = 2 * s + 3 + py, 2 * t + 3 + px
                    if 0 <= a < 7 and 0 <= b < 7:
                        ch = (py * 2 + px) * cin
                        w4 = w4.at[si, ti, ch : ch + cin, :].set(w[a, b])
    return w4


class _StemS2DConv(nn.Module):
    """7x7/s2 stem conv via space-to-depth packing (see _stem_s2d_weights).
    Parameter path/shape identical to the plain nn.Conv ('kernel',
    (7,7,cin,features)), so state dicts are interchangeable."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        w4 = _stem_s2d_weights(w)
        xp = _space_to_depth2(x)
        if self.dtype is not None:
            xp = xp.astype(self.dtype)
            w4 = w4.astype(self.dtype)
        import jax

        return jax.lax.conv_general_dilated(
            xp,
            w4,
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNetEncoder(nn.Module):
    """Encoder trunk. Returns (bottleneck, skips dict)."""

    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    in_stem_features: int = 64
    train: bool = False
    axis_name: str | None = None
    dtype: object = None
    # dynamic-int8 serving quantization for the block convs (the stem stays
    # high-precision, standard PTQ practice); see utils/quant.py
    quant: bool = False
    # compute the 7x7/s2 stem as a 4x4/s1 conv on a space-to-depth-packed
    # input (identical math, parameter-compatible; large-spatial conv passes
    # are the TPU bottleneck at these shapes).  Requires even H, W.
    stem_space_to_depth: bool = True

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(self, x):
        block_cls = _BLOCKS[self.block]
        skips: dict[str, Any] = {}
        if (
            self.stem_space_to_depth
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            x = _StemS2DConv(
                self.in_stem_features, dtype=self.dtype, name="conv1_1"
            )(x)
        else:
            x = nn.Conv(
                self.in_stem_features,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                name="conv1_1",
            )(x)
        skips["skip4"] = x  # pre-BN stem output (reference forward :352-353)
        x = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = self.in_stem_features
        for stage, (planes, n_blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * self.expansion)
                x = block_cls(
                    planes,
                    stride=s,
                    downsample=need_ds,
                    train=self.train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"layer{stage + 1}_{b}",
                )(x)
                inplanes = planes * self.expansion
            if stage == 0:
                skips["skip3"] = x
            elif stage == 1:
                skips["skip2"] = x

        # trailing conv2+bn2, no ReLU (reference :297-299, :366)
        x = conv(512 * self.expansion, 3, name="conv2", dtype=self.dtype, quant=self.quant)(x)
        x = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(x)
        return x, skips
