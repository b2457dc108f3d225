"""Fused native augmentation (native/host_pipeline.cpp cspn_aug_pack).

Parity contract vs the PIL reference chain (data/transforms.py, which
itself mirrors the reference's nyu_dataset_loader.py:80-109):
  - resize: PIL triangle-filter bilinear incl. downscale antialiasing;
    float weights vs PIL's int16 fixed point => <=1 LSB on u8, ~1e-6 f32
  - rotation: NEAREST over the inverse affine at pixel centers; PIL's
    incremental fixed-point accumulation can pick the other of two
    equidistant neighbors on knife-edge coordinates (<=0.2% of pixels)
  - jitter: ImageEnhance math with u8 rounding between ops => <=1 LSB
    per op (blend rounding)
  - normalize / depth-scale / sparse pack: exact (same math as
    cspn_pack_sample, tests/test_native.py)
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from cspn_tpu.data import native
from cspn_tpu.data.datasets import NyuDepthDataset

pytestmark = pytest.mark.skipif(
    not native.aug_available(), reason="native aug kernel unavailable"
)

MEAN = np.float32([0.485, 0.456, 0.406])
STD = np.float32([0.229, 0.224, 0.225])


def to_u8(rgbd):
    """Invert the normalize to compare in u8 LSB units."""
    return (rgbd[..., :3] * STD + MEAN) * 255.0


def run(rgb, depth, **kw):
    args = dict(resize_hw=None, angle=0.0, crop_hw=depth.shape, flip=False,
                jitter=[], inv_scale=1.0, n_sample=10, sparse_denom="total",
                seed=1)
    args.update(kw)
    out = native.aug_pack(rgb, depth, **args)
    assert out is not None
    return out


def test_resize_matches_pil(rng):
    rgb = rng.integers(0, 256, (480, 640, 3), np.uint8)
    depth = rng.uniform(0.1, 10, (480, 640)).astype(np.float32)
    rgbd, d = run(rgb, depth, resize_hw=(240, 320), crop_hw=(240, 320))
    pr = np.asarray(Image.fromarray(rgb).resize((320, 240), Image.BILINEAR))
    pd = np.asarray(
        Image.fromarray(depth, mode="F").resize((320, 240), Image.BILINEAR),
        np.float32,
    )
    assert np.abs(to_u8(rgbd) - pr).max() <= 1.0  # fixed-point vs float
    np.testing.assert_allclose(d, pd, rtol=1e-5, atol=1e-5)


def test_resize_upscale_matches_pil(rng):
    # upscale: support stays 1 (no antialias) -- classic bilinear
    rgb = rng.integers(0, 256, (60, 80, 3), np.uint8)
    depth = rng.uniform(0.1, 10, (60, 80)).astype(np.float32)
    rgbd, d = run(rgb, depth, resize_hw=(120, 160), crop_hw=(120, 160))
    pr = np.asarray(Image.fromarray(rgb).resize((160, 120), Image.BILINEAR))
    assert np.abs(to_u8(rgbd) - pr).max() <= 1.0


def test_rotation_nearest_close_to_pil(rng):
    rgb = rng.integers(0, 256, (64, 80, 3), np.uint8)
    depth = rng.uniform(0.1, 10, (64, 80)).astype(np.float32)
    for angle in (3.7, -4.9, 5.0):
        rgbd, d = run(rgb, depth, angle=angle)
        pr = np.asarray(Image.fromarray(rgb).rotate(angle))
        pd = np.asarray(
            Image.fromarray(depth, mode="F").rotate(angle), np.float32
        )
        # knife-edge pixels may pick the other equidistant neighbor
        frac = (np.abs(to_u8(rgbd) - pr) > 0.5).mean()
        assert frac <= 0.002, frac
        assert (np.abs(d - pd) > 1e-5).mean() <= 0.002


def test_rotation_zero_is_identity(rng):
    rgb = rng.integers(0, 256, (64, 80, 3), np.uint8)
    depth = rng.uniform(0.1, 10, (64, 80)).astype(np.float32)
    rgbd, d = run(rgb, depth, angle=0.0)
    np.testing.assert_allclose(to_u8(rgbd), rgb, atol=1e-3)
    np.testing.assert_array_equal(d, depth)


def test_jitter_matches_imageenhance(rng):
    rgb = rng.integers(0, 256, (64, 80, 3), np.uint8)
    depth = rng.uniform(0.1, 10, (64, 80)).astype(np.float32)
    enh = {0: ImageEnhance.Brightness, 1: ImageEnhance.Contrast,
           2: ImageEnhance.Color}
    cases = [
        [(0, 1.3)], [(1, 0.7)], [(2, 1.25)],
        [(2, 0.8), (1, 1.2), (0, 0.9)],
        [(1, 1.35), (0, 0.65), (2, 1.05)],
    ]
    for jitter in cases:
        rgbd, _ = run(rgb, depth, jitter=jitter)
        img = Image.fromarray(rgb)
        for op, f in jitter:
            img = enh[op](img).enhance(f)
        ref = np.asarray(img)
        # <=1 LSB blend-rounding drift per op
        assert np.abs(to_u8(rgbd) - ref).max() <= len(jitter) + 0.01


def test_crop_and_flip_match_pil(rng):
    rgb = rng.integers(0, 256, (61, 85, 3), np.uint8)  # odd diffs
    depth = rng.uniform(0.1, 10, (61, 85)).astype(np.float32)
    rgbd, d = run(rgb, depth, crop_hw=(30, 40), flip=True)
    img = Image.fromarray(rgb)
    w, h = img.size
    left = int(round((w - 40) / 2.0))
    up = int(round((h - 30) / 2.0))
    ref = np.asarray(
        img.crop((left, up, left + 40, up + 30)).transpose(
            Image.FLIP_LEFT_RIGHT
        )
    )
    np.testing.assert_allclose(to_u8(rgbd), ref, atol=1e-3)
    np.testing.assert_array_equal(d, depth[up:up + 30, left:left + 40][:, ::-1])


def test_strided_inputs_equal_contiguous(rng):
    # planar CHW transpose view (h5 layout) and box-crop slices must give
    # identical results to a contiguous copy
    chw = rng.integers(0, 256, (3, 100, 120), np.uint8)
    hwc_view = chw.transpose(1, 2, 0)
    depth_full = rng.uniform(0.1, 10, (130, 140)).astype(np.float32)
    depth_view = depth_full[10:110, 15:135]
    kw = dict(resize_hw=(50, 60), angle=2.0, crop_hw=(40, 50), flip=True,
              jitter=[(0, 1.1), (1, 0.9)], inv_scale=0.7, n_sample=50,
              sparse_denom="valid", seed=9)
    a = native.aug_pack(hwc_view, depth_view, **kw)
    b = native.aug_pack(
        np.ascontiguousarray(hwc_view), np.ascontiguousarray(depth_view), **kw
    )
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_sparse_counts_both_denominators(rng):
    rgb = rng.integers(0, 256, (200, 300, 3), np.uint8)
    depth = rng.uniform(1.0, 10, (200, 300)).astype(np.float32)
    depth[:100] = 0.0  # half invalid
    # total: p = n / (oh*ow) over all pixels, but zeros contribute nothing
    _, d1 = out1 = run(rgb, depth, n_sample=600, sparse_denom="total")
    n1 = (out1[0][..., 3] > 0).sum()
    # valid: p = n / n_valid => expected count ~= n_sample
    out2 = run(rgb, depth, n_sample=600, sparse_denom="valid")
    n2 = (out2[0][..., 3] > 0).sum()
    assert 200 <= n1 <= 400  # 600 * (valid fraction 0.5) +- noise
    assert 450 <= n2 <= 750
    nz = out2[0][..., 3] > 0
    np.testing.assert_allclose(out2[0][..., 3][nz], out2[1][nz], rtol=1e-6)


def _fixture_csv(tmp_path, rng, n=3):
    import h5py

    rows = []
    for i in range(n):
        p = tmp_path / f"{i}.h5"
        with h5py.File(p, "w") as f:
            f["rgb"] = rng.integers(0, 256, (3, 480, 640), dtype=np.uint8)
            f["depth"] = rng.uniform(0.5, 8.0, (480, 640)).astype(np.float32)
        rows.append(str(p))
    csv = tmp_path / "m.csv"
    csv.write_text("Name\n" + "\n".join(rows) + "\n")
    return str(csv)


def test_dataset_train_fused_close_to_pil_chain(tmp_path, rng):
    """Full train-mode sample: fused native vs the PIL oracle chain, same
    seed => same geometry/jitter draws; differences are bounded LSB
    rounding plus <=0.2% rotation knife-edge pixels."""
    csv = _fixture_csv(tmp_path, rng)
    kw = dict(split="train", n_sample=500, seed=11)
    for idx in range(3):
        a = NyuDepthDataset(csv, use_native=True, **kw)[idx]
        b = NyuDepthDataset(csv, use_native=False, **kw)[idx]
        assert a["rgbd"].shape == b["rgbd"].shape == (228, 304, 4)
        dr = np.abs(a["rgbd"][..., :3] - b["rgbd"][..., :3])
        # jitter rounding: ~1 LSB/op ~= 0.017 normalized units
        assert np.median(dr) < 0.06, np.median(dr)
        assert (dr > 0.12).mean() < 0.01  # rotation edges only
        dd = np.abs(a["depth"] - b["depth"])
        assert (dd > 1e-3).mean() < 0.005  # rotation edges only
        nz = a["rgbd"][..., 3] > 0
        np.testing.assert_allclose(a["rgbd"][..., 3][nz], a["depth"][nz],
                                   rtol=1e-6)


def test_kitti_dataset_fused_close_to_pil_chain(tmp_path, rng):
    """KITTI geometry through the fused path: box pre-crop (numpy slice of
    the planar source), NO resize, rotation/jitter/crop/flip, valid-pixel
    sparse denominator (kitti_dataset_loader.py:82,138 semantics)."""
    import h5py

    from cspn_tpu.data.datasets import KittiDataset

    rows = []
    for i in range(2):
        p = tmp_path / f"k{i}.h5"
        with h5py.File(p, "w") as f:
            f["rgb"] = rng.integers(0, 256, (3, 375, 1242), dtype=np.uint8)
            d = rng.uniform(0.5, 80.0, (375, 1242)).astype(np.float32)
            d[rng.random((375, 1242)) < 0.6] = 0.0  # sparse-gt-like zeros
            f["depth"] = d
    rows = [str(tmp_path / f"k{i}.h5") for i in range(2)]
    csv = tmp_path / "k.csv"
    csv.write_text("Name\n" + "\n".join(rows) + "\n")
    kw = dict(split="train", n_sample=500, seed=13)
    for idx in range(2):
        a = KittiDataset(str(csv), use_native=True, **kw)[idx]
        b = KittiDataset(str(csv), use_native=False, **kw)[idx]
        assert a["rgbd"].shape == b["rgbd"].shape == (228, 912, 4)
        dr = np.abs(a["rgbd"][..., :3] - b["rgbd"][..., :3])
        assert np.median(dr) < 0.06, np.median(dr)
        assert (dr > 0.12).mean() < 0.01
        dd = np.abs(a["depth"] - b["depth"])
        assert (dd > 1e-3).mean() < 0.005
        # valid-denominator sparse count ~ n_sample over the valid pixels
        n_nz = int((a["rgbd"][..., 3] > 0).sum())
        assert 300 <= n_nz <= 700, n_nz


def test_dataset_val_fused_matches_pil_chain(tmp_path, rng):
    """Val geometry (resize + crop only): fused native is essentially
    exact vs the PIL chain."""
    csv = _fixture_csv(tmp_path, rng, n=1)
    kw = dict(split="val", n_sample=500, seed=5)
    a = NyuDepthDataset(csv, use_native=True, **kw)[0]
    b = NyuDepthDataset(csv, use_native=False, **kw)[0]
    np.testing.assert_allclose(
        a["rgbd"][..., :3], b["rgbd"][..., :3], rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(a["depth"], b["depth"], rtol=1e-5, atol=1e-5)
