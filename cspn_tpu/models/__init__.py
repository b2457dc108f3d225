"""Model zoo (reference L1 layer): ResNet-UNet depth completion with CSPN.

Constructors mirror the reference's (torch_resnet_cspn_nyu.py:379-435) but are
geometry-parameterized (no hard-coded 228x304) and layout NHWC.
"""

from cspn_tpu.models.resnet import BasicBlock, Bottleneck, ResNetEncoder
from cspn_tpu.models.unet import (
    CSPNUNet,
    cspn_unet_resnet18,
    cspn_unet_resnet34,
    cspn_unet_resnet50,
    cspn_unet_resnet101,
    cspn_unet_resnet152,
    unet_baseline_resnet18,
    unet_baseline_resnet50,
)

__all__ = [
    "BasicBlock",
    "Bottleneck",
    "ResNetEncoder",
    "CSPNUNet",
    "cspn_unet_resnet18",
    "cspn_unet_resnet34",
    "cspn_unet_resnet50",
    "cspn_unet_resnet101",
    "cspn_unet_resnet152",
    "unet_baseline_resnet18",
    "unet_baseline_resnet50",
]
