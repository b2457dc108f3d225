"""ResNet-UNet depth completion models with CSPN post-processing.

NHWC re-implementation of cspn_pytorch/models/torch_resnet_cspn_nyu.py's
`ResNet` (:278-376) with:
  - geometry derived from the input shape (the reference hard-codes the NYU
    228x304 pyramid at :314-319; KITTI crops use the same ceil-halving chain),
  - the CSPN post-process running through the fused Pallas kernel on TPU,
  - a no-CSPN baseline variant covering the reference's missing
    `torch_resnet`/`base_model` (train.py:75, models/__init__.py:1-2),
  - resnet18-trunk constructors covering the missing
    `torch_resnet_cspn_kitti` (train.py:73,146-147).

Input: [N, H, W, 4] RGBD; channel 3 is the sparse depth used for anchoring
(reference forward :351).  Output: [N, H, W] dense depth.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cspn_tpu.models.decoder import (
    GudiUpConvLast,
    GudiUpProj,
    GudiUpProjCat,
    _subpixel_weights,
)
from cspn_tpu.models.resnet import ResNetEncoder
from cspn_tpu.ops.cspn import cspn2d
from cspn_tpu.ops.d2s_pallas import depth_to_space2


class _BareKernel(nn.Module):
    """Parameter holder: a conv kernel at this module's tree path (init
    matches SubpixelUnpoolConv: 'kernel', he_normal, f32), so the fused
    multi-head conv keeps checkpoint-compatible per-head parameters."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.he_normal(), self.shape, jnp.float32
        )


class _HeadKernel(nn.Module):
    """Scope shim reproducing GudiUpConvLast's param path <name>/conv1/kernel."""

    features: int
    kernel: int
    cin: int

    @nn.compact
    def __call__(self):
        return _BareKernel(
            (self.kernel, self.kernel, self.cin, self.features), name="conv1"
        )()


def ceil_half_chain(h: int, w: int, n: int = 5) -> list[tuple[int, int]]:
    """Feature-map sizes [(H,W), (H/2,W/2), ...] using the encoder's
    ceil-halving (7x7/s2 conv, 3x3/s2 pool, 3x3/s2 convs all give ceil(n/2))."""
    sizes = [(h, w)]
    for _ in range(n):
        h, w = -(-h // 2), -(-w // 2)
        sizes.append((h, w))
    return sizes


class CSPNUNet(nn.Module):
    """Encoder-decoder with dual heads (depth + affinity) and CSPN refinement."""

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    cspn_steps: int = 24
    cspn_norm_type: str = "8sum"
    use_cspn: bool = True
    train: bool = False
    axis_name: str | None = None
    cspn_backend: str = "auto"
    # when set (a jax.sharding.Mesh with 'data'/'spatial' axes), the CSPN
    # post-process runs spatially sharded with halo exchange (parallel/halo.py)
    spatial_mesh: Any = None
    spatial_halo: Any = None  # None = cost-model-chosen K (parallel.halo.choose_halo)
    # mixed precision: compute dtype for the conv net (e.g. jnp.bfloat16);
    # params stay float32 and the CSPN post-process always runs in float32
    dtype: Any = None
    # dynamic-int8 serving quantization of the encoder blocks + decoder
    # body (stem and the depth/guidance heads stay high-precision, and the
    # CSPN post-process stays f32).  Serving-only: round() has zero
    # gradient.  Params are unchanged -- any checkpoint serves quantized.
    quant: bool = False
    # module names kept high-precision when quant=True.  Default excludes
    # the last decoder block: quantizing it perturbs the near-zero tail of
    # the depth head enough to regress inverse-depth metrics ~37% (iRMSE
    # weights 1/pred; result/int8_eval.json ablation) while contributing
    # little serving time (it has the smallest channel counts).
    quant_exclude: Sequence[str] = ("gud_up_proj_layer4",)
    # fused sub-pixel unpool+conv decoder (identical math; False = the naive
    # unpool-then-conv composition, kept as the translation baseline)
    subpixel: bool = True
    # opt-in HBM I/O dtype for the fused CSPN kernel (jnp.bfloat16 halves
    # its gate/depth read traffic; in-VMEM arithmetic stays f32).  Accuracy
    # trade measured in result/bf16_io_eval.json.
    cspn_io_dtype: Any = None
    # run the depth head (1 ch) and affinity head (8 ch) as ONE fused
    # 9-channel subpixel conv: each tiny output-channel count pads to full
    # 128 lanes on TPU, so two separate head convs cost two full conv
    # passes for ~nothing (same trick measured 4.4+7.7 ms -> one pass on
    # the stereo heads, models/stereo.py).  Identical math and parameter
    # paths; engaged only on the subpixel+CSPN path.
    fuse_heads: bool = True

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        assert c == 4, "input must be RGBD [N, H, W, 4]"
        sparse_depth = x[..., 3]
        sizes = ceil_half_chain(h, w, 5)
        e = 4 if self.block == "bottleneck" else 1

        assert not (self.quant and self.train), "int8 quantization is serving-only"

        def q(name: str) -> bool:
            return self.quant and name not in tuple(self.quant_exclude)

        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats, skips = ResNetEncoder(
            block=self.block,
            layers=self.layers,
            train=self.train,
            axis_name=self.axis_name,
            dtype=self.dtype,
            quant=q("encoder"),
            name="encoder",
        )(x)

        kw = dict(train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                  subpixel=self.subpixel)
        d = GudiUpProj(256 * e, *sizes[4], **kw,
                       quant=q("gud_up_proj_layer1"),
                       name="gud_up_proj_layer1")(feats)
        d = GudiUpProjCat(128 * e, *sizes[3], **kw,
                          quant=q("gud_up_proj_layer2"),
                          name="gud_up_proj_layer2")(d, skips["skip2"])
        d = GudiUpProjCat(64 * e, *sizes[2], **kw,
                          quant=q("gud_up_proj_layer3"),
                          name="gud_up_proj_layer3")(d, skips["skip3"])
        d = GudiUpProjCat(64, *sizes[1], **kw,
                          quant=q("gud_up_proj_layer4"),
                          name="gud_up_proj_layer4")(d, skips["skip4"])
        if self.use_cspn and self.subpixel and self.fuse_heads:
            # one 9-channel subpixel head conv; channel 0 = depth, 1..8 =
            # affinity.  Per-output-channel conv math is identical to the
            # two separate SubpixelUnpoolConv heads (same weights at the
            # same tree paths, concatenated along cout before the reindex).
            cin = d.shape[-1]
            w5 = _HeadKernel(1, 3, cin, name="gud_up_proj_layer5")()
            w6 = _HeadKernel(8, 3, cin, name="gud_up_proj_layer6")()
            wc = jnp.concatenate([w5, w6], axis=-1)
            xh = d
            if self.dtype is not None:
                # cast BEFORE the reindex (decoder.py:SubpixelUnpoolConv)
                xh = xh.astype(self.dtype)
                wc = wc.astype(self.dtype)
            import jax as _jax

            y = _jax.lax.conv_general_dilated(
                xh,
                _subpixel_weights(wc, 3),
                window_strides=(1, 1),
                padding=((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            heads = depth_to_space2(y, *sizes[0])
            blur_depth = heads[..., 0].astype(jnp.float32)
            guidance = heads[..., 1:].astype(jnp.float32)
        else:
            blur_depth = GudiUpConvLast(
                1, *sizes[0], dtype=self.dtype, subpixel=self.subpixel,
                name="gud_up_proj_layer5",
            )(d)[..., 0].astype(jnp.float32)
            if not self.use_cspn:
                return blur_depth
            guidance = GudiUpConvLast(
                8, *sizes[0], dtype=self.dtype, subpixel=self.subpixel,
                name="gud_up_proj_layer6",
            )(d).astype(jnp.float32)
        if self.spatial_mesh is not None:
            from cspn_tpu.parallel.halo import cspn2d_spatial

            return cspn2d_spatial(
                guidance,
                blur_depth,
                sparse_depth,
                mesh=self.spatial_mesh,
                steps=self.cspn_steps,
                norm_type=self.cspn_norm_type,
                halo=self.spatial_halo,
                training=self.train,
            )
        return cspn2d(
            guidance,
            blur_depth,
            sparse_depth,
            steps=self.cspn_steps,
            norm_type=self.cspn_norm_type,
            backend=self.cspn_backend,
            io_dtype=self.cspn_io_dtype,
        )


_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _make(depth: int, use_cspn: bool, **kwargs) -> CSPNUNet:
    block, layers = _LAYERS[depth]
    return CSPNUNet(block=block, layers=layers, use_cspn=use_cspn, **kwargs)


def cspn_unet_resnet18(**kw):
    """KITTI trunk (reference train.py:146-147 uses resnet18 for KITTI)."""
    return _make(18, True, **kw)


def cspn_unet_resnet34(**kw):
    return _make(34, True, **kw)


def cspn_unet_resnet50(**kw):
    """NYU flagship (reference train.py:142-144)."""
    return _make(50, True, **kw)


def cspn_unet_resnet101(**kw):
    return _make(101, True, **kw)


def cspn_unet_resnet152(**kw):
    return _make(152, True, **kw)


def unet_baseline_resnet18(**kw):
    """No-CSPN baseline (the reference's missing `torch_resnet`)."""
    return _make(18, False, **kw)


def unet_baseline_resnet50(**kw):
    return _make(50, False, **kw)
