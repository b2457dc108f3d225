"""Gudi up-projection decoder blocks (reference L1 layer).

NHWC re-implementation of the decoder half of
cspn_pytorch/models/torch_resnet_cspn_nyu.py:
  - `unpool2x`: 2x2 zero-insert unpooling.  The reference has two variants --
    "fast" grouped conv_transpose with kernel [[1,0],[0,0]] (:41-54) and
    "slow" nearest-upsample + checkerboard mask (:221-231).  Both place each
    input value at the even (top-left) position of its 2x2 cell and zero the
    rest, so a single interleave-with-zeros implementation reproduces both.
  - `GudiUpProj`       <- Gudi_UpProj_Block (:208-240)
  - `GudiUpProjCat`    <- Gudi_UpProj_Block_Cat (:243-276), concatenates a
    skip map after the first conv (:270)
  - `GudiUpConvLast`   <- Simple_Gudi_UpConv_Block_Last_Layer (:187-206),
    raw head output (no BN/ReLU)

Output geometry is parameterized: blocks crop the 2x-unpooled map to
(oheight, owidth) like the reference's narrow() calls (:176-179,:195-201),
but the sizes are derived from the input shape by the model rather than
hard-coded (:314-319).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cspn_tpu.models.resnet import BatchNorm, conv


def unpool2x(x: jnp.ndarray, oheight: int, owidth: int) -> jnp.ndarray:
    """Zero-insert 2x upsample (value at top-left of each 2x2 cell), then
    crop to (oheight, owidth).  x: [N, H, W, C]."""
    n, h, w, c = x.shape
    z = jnp.zeros_like(x)
    # interleave along W: [N, H, W, 2, C] -> [N, H, 2W, C]
    x = jnp.stack([x, z], axis=3).reshape(n, h, 2 * w, c)
    z = jnp.zeros_like(x)
    # interleave along H: [N, H, 2, 2W, C] -> [N, 2H, 2W, C]
    x = jnp.stack([x, z], axis=2).reshape(n, 2 * h, 2 * w, c)
    return x[:, :oheight, :owidth, :]


class UpProj(nn.Module):
    """Classic up-projection block (reference UpProj_Block, :126-160).

    The reference constructs these for its `up_proj_layer1..4` path
    (:300-311) which the released forward() never calls; provided for full
    architectural parity and for no-skip decoder variants.  When
    (oheight, owidth) are 0 the block upsamples to exactly 2x like the
    reference's scale branch (:143-146).
    """

    features: int
    oheight: int = 0
    owidth: int = 0
    train: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        oh = self.oheight or 2 * x.shape[1]
        ow = self.owidth or 2 * x.shape[2]
        x = unpool2x(x, oh, ow)
        out = conv(self.features, 5, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = conv(self.features, 3, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        sc = conv(self.features, 5, dtype=self.dtype, name="sc_conv1")(x)
        sc = BatchNorm(not self.train, self.axis_name, self.dtype, name="sc_bn1")(sc)
        return nn.relu(out + sc)


class GudiUpProj(nn.Module):
    """Up-projection block without skip input (Gudi_UpProj_Block)."""

    features: int
    oheight: int
    owidth: int
    train: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = unpool2x(x, self.oheight, self.owidth)
        out = conv(self.features, 5, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = conv(self.features, 3, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        sc = conv(self.features, 5, dtype=self.dtype, name="sc_conv1")(x)
        sc = BatchNorm(not self.train, self.axis_name, self.dtype, name="sc_bn1")(sc)
        return nn.relu(out + sc)


class GudiUpProjCat(nn.Module):
    """Up-projection block with skip concatenation (Gudi_UpProj_Block_Cat)."""

    features: int
    oheight: int
    owidth: int
    train: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, side_input):
        x = unpool2x(x, self.oheight, self.owidth)
        out = conv(self.features, 5, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = jnp.concatenate([out, side_input], axis=-1)
        out = conv(self.features, 3, dtype=self.dtype, name="conv1_1")(out)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1_1")(out))
        out = conv(self.features, 3, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        sc = conv(self.features, 5, dtype=self.dtype, name="sc_conv1")(x)
        sc = BatchNorm(not self.train, self.axis_name, self.dtype, name="sc_bn1")(sc)
        return nn.relu(out + sc)


class GudiUpConvLast(nn.Module):
    """Head block: unpool + 3x3 conv, raw output (no BN/ReLU)."""

    features: int
    oheight: int
    owidth: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = unpool2x(x, self.oheight, self.owidth)
        return conv(self.features, 3, dtype=self.dtype, name="conv1")(x)
