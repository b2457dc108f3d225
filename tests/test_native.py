"""Native host-pipeline library: build, correctness vs numpy, determinism."""

import numpy as np
import pytest

from cspn_tpu.data import native
from cspn_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_pack_sample_matches_numpy_normalization(lib_ok, rng):
    h, w = 64, 80
    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = rng.uniform(0.5, 8.0, (h, w)).astype(np.float32)
    rgbd, depth_out = native.pack_sample(rgb, depth, 0.8, 0.0, seed=1)
    want_rgb = (rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(rgbd[..., :3], want_rgb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth_out, depth * 0.8, rtol=1e-6)
    assert rgbd[..., 3].sum() == 0  # p=0 -> no sparse points


def test_pack_sample_sparse_stats_and_determinism(lib_ok, rng):
    h, w = 128, 128
    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = rng.uniform(1.0, 5.0, (h, w)).astype(np.float32)
    p = 500 / (h * w)
    a, _ = native.pack_sample(rgb, depth, 1.0, p, seed=42)
    b, _ = native.pack_sample(rgb, depth, 1.0, p, seed=42)
    np.testing.assert_array_equal(a, b)
    c, _ = native.pack_sample(rgb, depth, 1.0, p, seed=43)
    assert not np.array_equal(a[..., 3], c[..., 3])
    n = (a[..., 3] > 0).sum()
    assert 300 < n < 750  # ~Binomial(16384, 0.0305) ≈ 500
    nz = a[..., 3] > 0
    np.testing.assert_allclose(a[..., 3][nz], depth[nz], rtol=1e-6)


def test_count_valid(lib_ok):
    d = np.zeros((10, 10), np.float32)
    d[:4] = 2.0
    assert native.count_valid(d) == 40


def test_dataset_native_path_equivalent_shape(lib_ok, tmp_path, rng):
    import h5py

    from cspn_tpu.data import NyuDepthDataset

    p = tmp_path / "f.h5"
    with h5py.File(p, "w") as f:
        f["rgb"] = rng.integers(0, 255, (3, 480, 640), dtype=np.uint8)
        f["depth"] = rng.uniform(0.5, 8.0, (480, 640)).astype(np.float32)
    csv = tmp_path / "m.csv"
    csv.write_text(f"Name\n{p}\n")

    s_nat = NyuDepthDataset(str(csv), split="val", n_sample=500, seed=1, use_native=True)[0]
    s_np = NyuDepthDataset(str(csv), split="val", n_sample=500, seed=1, use_native=False)[0]
    assert s_nat["rgbd"].shape == s_np["rgbd"].shape
    # identical geometric path -> identical rgb & depth channels
    np.testing.assert_allclose(s_nat["rgbd"][..., :3], s_np["rgbd"][..., :3], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_nat["depth"], s_np["depth"], rtol=1e-6)
    # sparse channels differ only in which pixels were sampled
    nz = s_nat["rgbd"][..., 3] > 0
    np.testing.assert_allclose(s_nat["rgbd"][..., 3][nz], s_nat["depth"][nz], rtol=1e-6)
