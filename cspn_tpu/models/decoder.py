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
import jax
import jax.numpy as jnp

from cspn_tpu.models.resnet import BatchNorm, conv
from cspn_tpu.ops.d2s_pallas import depth_to_space2


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


def _phase_taps(k: int, p: int) -> tuple[list[int], tuple[int, int]]:
    """Valid source offsets s (with dy = 2s - p, |dy| <= k//2) for one
    output phase p of the zero-insert-unpool + kxk conv, and the explicit
    conv padding (lo, hi) that realizes out[y] = sum_s in[y+s] K[s].
    The valid offsets are contiguous: k=5 -> {-1,0,1} / {0,1};
    k=3 -> {0} / {0,1}."""
    kh = k // 2
    s_lo = -1 if k >= 5 else 0
    ss = [s for s in range(s_lo, s_lo + kh + 2) if abs(2 * s - p) <= kh]
    return ss, (-ss[0], ss[-1])


def _phase_kernel(w: jnp.ndarray, k: int, px: int, py: int) -> jnp.ndarray:
    """Exact (zero-free) kernel of one output phase: rows/cols are the
    VALID taps only, unlike _subpixel_weights which zero-pads every phase
    to the common SxS grid (k=5: 25 real taps vs 36 padded slots -- the
    padded form spends 44% of its MXU FLOPs on structural zeros)."""
    kh = k // 2
    ss, _ = _phase_taps(k, py)
    ts, _ = _phase_taps(k, px)
    rows = jnp.stack([w[2 * s - py + kh] for s in ss], axis=0)
    return jnp.stack([rows[:, 2 * t - px + kh] for t in ts], axis=1)


def _subpixel_weights(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reindex a k x k kernel (HWIO) applied to a zero-inserted 2x upsample
    into an S x S kernel at half resolution producing 4 phase groups
    (S = k//2 + 1).  Output channel layout: (px*2+py)*cout + c -- px-major so
    the Pallas depth-to-space kernel can interleave both output rows with one
    pair of full-lane-width permutation matmuls (see ops/d2s_pallas.py).

    Built from static slices of `w` stacked/concatenated (pure data
    movement, one fused pass over the weights; an earlier `.at[].set`
    scatter-chain formulation cost ~3 ms/step on the flagship because XLA
    materialized the update chain and its transpose every step)."""
    kh = k // 2
    s_lo = -1 if k >= 5 else 0  # source-offset range: k=5 -> {-1,0,1}, k=3 -> {0,1}
    size = kh + 1
    cin, cout = w.shape[2], w.shape[3]
    zeros = jnp.zeros((cin, cout), w.dtype)
    phases = []
    for px in range(2):
        for py in range(2):
            rows = []
            for si in range(size):
                cols = []
                for ti in range(size):
                    s, t = si + s_lo, ti + s_lo
                    dy, dx = 2 * s - py, 2 * t - px
                    inside = abs(dy) <= kh and abs(dx) <= kh
                    cols.append(w[dy + kh, dx + kh] if inside else zeros)
                rows.append(jnp.stack(cols, axis=0))
            phases.append(jnp.stack(rows, axis=0))  # (S, S, cin, cout)
    return jnp.concatenate(phases, axis=-1)


class SubpixelUnpoolConv(nn.Module):
    """`unpool2x -> crop -> k x k conv` computed as ONE half-resolution conv
    plus depth-to-space -- exactly equivalent, ~3-4x cheaper on TPU.

    Equivalence: the zero-inserted rows/cols of the unpooled map contribute
    nothing, so each of the 4 output phases only reads a small sub-kernel of
    the original weights at source pixels {i-1..i+1} (k=5) or {i, i+1}
    (k=3); cropping an odd final row/col before vs after the conv is
    identical because that row is an inserted zero row.  The parameter is
    named/shaped like the plain conv (`kernel`, (k,k,cin,cout)), so state
    dicts are interchangeable with the unfused path.
    """

    features: int
    kernel: int
    oheight: int
    owidth: int
    dtype: object = None
    quant: bool = False  # dynamic-int8 serving execution (utils/quant.py)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, cin, self.features),
            jnp.float32,
        )
        pad = (1, 1) if k >= 5 else (0, 1)
        if self.quant:
            from cspn_tpu.utils.quant import (
                int8_conv_prequant,
                module_act_scale,
                module_qcache,
                module_weight_qcache,
                quantize_tensor,
                quantize_tensor_static,
                quantize_weights,
            )

            out_dtype = self.dtype or x.dtype
            if self.features >= 128:
                # int8 phase-SPLIT (same >=128 gate as the float path
                # below): the fused zero-padded kernel wastes the same 44%
                # of MXU slots in s8 as in bf16.  Bit-identical to the
                # fused int8 form: the per-output-channel scales of the
                # expanded kernel ARE the per-(phase, channel) scales
                # (structural zeros change neither the abs-max nor the s32
                # accumulation), and the px-major concat preserves the
                # depth_to_space2 layout.  One activation quantization is
                # shared by all four phase convs.
                phases = module_qcache(
                    self,
                    lambda: tuple(
                        quantize_weights(_phase_kernel(w, k, px2, py2))
                        for px2 in range(2)
                        for py2 in range(2)
                    ),
                )
                x_scale = module_act_scale(self, x)
                xq, xs = (
                    quantize_tensor(x)
                    if x_scale is None
                    else quantize_tensor_static(x, x_scale)
                )
                parts = []
                idx = 0
                for px2 in range(2):
                    for py2 in range(2):
                        _, (plo_h, phi_h) = _phase_taps(k, py2)
                        _, (plo_w, phi_w) = _phase_taps(k, px2)
                        wq, ws = phases[idx]
                        idx += 1
                        yq = jax.lax.conv_general_dilated(
                            xq,
                            wq,
                            window_strides=(1, 1),
                            padding=((plo_h, phi_h), (plo_w, phi_w)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32,
                        )
                        parts.append(
                            (yq.astype(jnp.float32) * (xs * ws)).astype(out_dtype)
                        )
                y = jnp.concatenate(parts, axis=-1)
            else:
                # quantize the REINDEXED weights (per phase-expanded output
                # channel) so dequantization happens before depth-to-space;
                # served from the load-time qcache when present
                wq, ws = module_weight_qcache(
                    self, lambda: _subpixel_weights(w, k)
                )
                y = int8_conv_prequant(x, wq, ws, (1, 1), (pad, pad),
                                       out_dtype=out_dtype,
                                       x_scale=module_act_scale(self, x))
            return depth_to_space2(y, self.oheight, self.owidth)
        if self.dtype is not None:
            # cast BEFORE the reindex: the reindex is pure data movement, so
            # cast-then-move is bit-identical to move-then-cast and halves
            # the reindex's HBM traffic (it runs every train step)
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        if self.features >= 128:
            # phase-SPLIT execution: one exact small conv per output phase
            # instead of one conv over the zero-padded common tap grid.
            # k=5 spends 25 real taps vs 36 padded slots, so the fused form
            # wastes 44% of its MXU FLOPs on structural zeros; the split
            # measured 13-24% faster at the flagship's three big decoder
            # stages and WORSE at small per-phase channel counts
            # (result/subpixel_split_probe.json) -- hence the >=128 gate.
            # px-major concat preserves the depth_to_space2 channel layout.
            parts = []
            for px2 in range(2):
                for py2 in range(2):
                    _, (plo_h, phi_h) = _phase_taps(k, py2)
                    _, (plo_w, phi_w) = _phase_taps(k, px2)
                    parts.append(
                        jax.lax.conv_general_dilated(
                            x,
                            _phase_kernel(w, k, px2, py2),
                            window_strides=(1, 1),
                            padding=((plo_h, phi_h), (plo_w, phi_w)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        )
                    )
            y = jnp.concatenate(parts, axis=-1)
        else:
            w2 = _subpixel_weights(w, k)
            y = jax.lax.conv_general_dilated(
                x,
                w2,
                window_strides=(1, 1),
                padding=(pad, pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # jnp backend: the Pallas single-pass interleave measured SLOWER
        # in-model than XLA's two-pass lowering (see ops/d2s_pallas.py)
        return depth_to_space2(y, self.oheight, self.owidth)


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
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        oh = self.oheight or 2 * x.shape[1]
        ow = self.owidth or 2 * x.shape[2]
        x = unpool2x(x, oh, ow)
        out = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = conv(self.features, 3, dtype=self.dtype, quant=self.quant, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        sc = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="sc_conv1")(x)
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
    quant: bool = False
    subpixel: bool = True  # fused unpool+conv (identical math, ~3x faster)

    @nn.compact
    def __call__(self, x):
        if self.subpixel:
            out = SubpixelUnpoolConv(self.features, 5, self.oheight, self.owidth,
                                     dtype=self.dtype, quant=self.quant,
                                     name="conv1")(x)
            sc = SubpixelUnpoolConv(self.features, 5, self.oheight, self.owidth,
                                    dtype=self.dtype, quant=self.quant,
                                    name="sc_conv1")(x)
        else:
            x = unpool2x(x, self.oheight, self.owidth)
            out = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="conv1")(x)
            sc = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="sc_conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = conv(self.features, 3, dtype=self.dtype, quant=self.quant, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
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
    quant: bool = False
    subpixel: bool = True

    @nn.compact
    def __call__(self, x, side_input):
        if self.subpixel:
            out = SubpixelUnpoolConv(self.features, 5, self.oheight, self.owidth,
                                     dtype=self.dtype, quant=self.quant,
                                     name="conv1")(x)
            sc = SubpixelUnpoolConv(self.features, 5, self.oheight, self.owidth,
                                    dtype=self.dtype, quant=self.quant,
                                    name="sc_conv1")(x)
        else:
            x = unpool2x(x, self.oheight, self.owidth)
            out = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="conv1")(x)
            sc = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="sc_conv1")(x)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out))
        out = jnp.concatenate([out, side_input], axis=-1)
        out = conv(self.features, 3, dtype=self.dtype, quant=self.quant, name="conv1_1")(out)
        out = nn.relu(BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1_1")(out))
        out = conv(self.features, 3, dtype=self.dtype, quant=self.quant, name="conv2")(out)
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn2")(out)
        sc = BatchNorm(not self.train, self.axis_name, self.dtype, name="sc_bn1")(sc)
        return nn.relu(out + sc)


class GudiUpConv(nn.Module):
    """Simple up-conv block: unpool + 5x5 conv + BN + ReLU (reference
    Simple_Gudi_UpConv_Block, torch_resnet_cspn_nyu.py:162-185; constructed
    by the reference's no-skip decoder path).  Subpixel form is the fused
    equivalent."""

    features: int
    oheight: int
    owidth: int
    train: bool = False
    axis_name: str | None = None
    dtype: object = None
    quant: bool = False
    subpixel: bool = True

    @nn.compact
    def __call__(self, x):
        if self.subpixel:
            out = SubpixelUnpoolConv(self.features, 5, self.oheight, self.owidth,
                                     dtype=self.dtype, quant=self.quant,
                                     name="conv1")(x)
        else:
            out = conv(self.features, 5, dtype=self.dtype, quant=self.quant, name="conv1")(
                unpool2x(x, self.oheight, self.owidth)
            )
        out = BatchNorm(not self.train, self.axis_name, self.dtype, name="bn1")(out)
        return nn.relu(out)


class GudiUpConvLast(nn.Module):
    """Head block: unpool + 3x3 conv, raw output (no BN/ReLU)."""

    features: int
    oheight: int
    owidth: int
    dtype: object = None
    subpixel: bool = True

    @nn.compact
    def __call__(self, x):
        if self.subpixel:
            return SubpixelUnpoolConv(self.features, 3, self.oheight, self.owidth,
                                      dtype=self.dtype, name="conv1")(x)
        x = unpool2x(x, self.oheight, self.owidth)
        # head convs stay unquantized by design (no quant field here)
        return conv(self.features, 3, dtype=self.dtype, name="conv1")(x)
