"""Input pipeline (reference L2 layer): datasets, transforms, loaders.

Host-side numpy/PIL preprocessing feeding device-side jit-compiled compute;
per-host sharding hooks for multi-host data parallelism.
"""

from cspn_tpu.data.transforms import (
    CenterCrop,
    ColorJitter,
    Compose,
    Crop,
    Normalize,
    Resize,
    Rotation,
)
from cspn_tpu.data.datasets import (
    KittiDataset,
    NyuDepthDataset,
    SyntheticDepthDataset,
    create_sparse_depth,
)
from cspn_tpu.data.loader import DataLoader
from cspn_tpu.data.stereo import SceneFlowStereoDataset, read_pfm, write_pfm

__all__ = [
    "CenterCrop",
    "ColorJitter",
    "Compose",
    "Crop",
    "Normalize",
    "Resize",
    "Rotation",
    "NyuDepthDataset",
    "KittiDataset",
    "SyntheticDepthDataset",
    "create_sparse_depth",
    "DataLoader",
    "SceneFlowStereoDataset",
    "read_pfm",
    "write_pfm",
]
