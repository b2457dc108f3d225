"""Host-side image/depth transforms (reference L2: data_transform.py).

PIL + numpy implementation of the transform chain the reference builds from
torchvision + its own data_transform.py.  Depth maps ride as PIL mode-'F'
images so geometric transforms stay float-exact (the reference's custom
ToTensor keeps mode-'F' un-scaled, data_transform.py:141-187).

Semantics matched to the reference:
    Resize      -- shorter side to `size`, bilinear (torchvision Resize)
    Rotation    -- PIL rotate, NEAREST, same canvas (data_transform.py:455-493)
    Crop        -- box crop (left, right, up, down) (data_transform.py:269-293)
    CenterCrop  -- torchvision CenterCrop
    ColorJitter -- brightness/contrast/saturation in [1-a, 1+a], random order
                   (torchvision PIL backend uses ImageEnhance, as here)
    Normalize   -- (x - mean) / std on [0,1] float arrays
    hflip       -- PIL FLIP_LEFT_RIGHT
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    """Resize shorter side to `size` keeping aspect ratio (bilinear)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        if h <= w:
            nh, nw = self.size, max(1, round(w * self.size / h))
        else:
            nw, nh = self.size, max(1, round(h * self.size / w))
        return img.resize((nw, nh), Image.BILINEAR)


class Rotation:
    """Rotate by a fixed angle (degrees), NEAREST, same canvas size."""

    def __init__(self, degrees: float):
        self.degrees = degrees

    def __call__(self, img: Image.Image) -> Image.Image:
        return img.rotate(self.degrees)


class Crop:
    """Box crop to [left, right) x [up, down) (reference Crop order)."""

    def __init__(self, left: int, right: int, up: int, down: int):
        self.box = (left, up, right, down)

    def __call__(self, img: Image.Image) -> Image.Image:
        return img.crop(self.box)


class CenterCrop:
    def __init__(self, size: tuple[int, int]):
        self.oh, self.ow = size

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        left = int(round((w - self.ow) / 2.0))
        up = int(round((h - self.oh) / 2.0))
        return img.crop((left, up, left + self.ow, up + self.oh))


class ColorJitter:
    """Random brightness/contrast/saturation, factors ~ U[1-a, 1+a], applied
    in random order (torchvision semantics)."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.4, rng=None):
        self.b, self.c, self.s = brightness, contrast, saturation
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        if self.b > 0:
            f = self.rng.uniform(max(0.0, 1 - self.b), 1 + self.b)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.c > 0:
            f = self.rng.uniform(max(0.0, 1 - self.c), 1 + self.c)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.s > 0:
            f = self.rng.uniform(max(0.0, 1 - self.s), 1 + self.s)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        for i in self.rng.permutation(len(ops)):
            img = ops[i](img)
        return img


class Normalize:
    """(x - mean) / std per channel on an HWC [0,1] float array."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return (arr - self.mean) / self.std


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def rgb_to_array(img: Image.Image) -> np.ndarray:
    """PIL RGB -> HWC float32 in [0,1] (torchvision ToTensor semantics)."""
    return np.asarray(img, dtype=np.float32) / 255.0


def depth_to_array(img: Image.Image) -> np.ndarray:
    """PIL mode-'F' depth -> HW float32, values preserved
    (reference data_transform.ToTensor keeps floats un-scaled)."""
    return np.asarray(img, dtype=np.float32)


def unnormalize(arr: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """Inverse of Normalize (reference utils.un_normalize, utils.py:175-180)."""
    return arr * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
