"""Golden-output regression test: deterministic init + fixed synthetic input
-> stored output statistics and patches.  Catches silent numerical drift in
the model/op stack across refactors (SURVEY.md §4 golden-number testing)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cspn_tpu.data import SyntheticDepthDataset
from cspn_tpu.models import cspn_unet_resnet18

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                       "cspn_unet_resnet18_32x48.npz")


def test_model_output_matches_golden():
    ds = SyntheticDepthDataset(length=1, hw=(32, 48), n_sample=64, seed=5)
    x = jnp.asarray(ds[0]["rgbd"][None])
    model = cspn_unet_resnet18(cspn_steps=8, cspn_backend="reference")
    v = model.init(jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(v, x))
    g = np.load(_GOLDEN)
    np.testing.assert_allclose(out.mean(), g["mean"], rtol=1e-4)
    np.testing.assert_allclose(out.std(), g["std"], rtol=1e-4)
    np.testing.assert_allclose(out[0, :6, :6], g["corner"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out[0, 14:18, 22:26], g["center"], rtol=1e-3, atol=1e-4)


def test_stereo_model_output_matches_golden():
    """Pins the stereo stack end-to-end (feature extractor, cost volume,
    batched-2D 3D convs, fused heads, 3D CSPN, trilinear regression)."""
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.models.stereo import PSMNetCSPN

    ds = SyntheticStereoDataset(length=1, hw=(32, 48), max_disp=16, seed=7)
    s = ds[0]
    left = jnp.asarray(s["left"][None])
    right = jnp.asarray(s["right"][None])
    # guidance_zero_init=False: the golden predates zero-init heads and a
    # random guidance head exercises a NON-trivial propagation (zero gates
    # would make the CSPN step an identity and pin nothing)
    model = PSMNetCSPN(max_disp=16, features=8, cspn_steps=4, use_cspn=True,
                       train=False, guidance_zero_init=False)
    v = model.init(jax.random.PRNGKey(0), left, right)
    out = np.asarray(model.apply(v, left, right))
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "psmnet_cspn_32x48.npz"))
    np.testing.assert_allclose(out.mean(), g["mean"], rtol=1e-4)
    np.testing.assert_allclose(out.std(), g["std"], rtol=1e-3)
    np.testing.assert_allclose(out[0, :6, :6], g["corner"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out[0, 14:18, 22:26], g["center"], rtol=1e-3, atol=1e-4)


def test_subpixel_and_plain_match_golden():
    """Both decoder paths must reproduce the same golden output."""
    ds = SyntheticDepthDataset(length=1, hw=(32, 48), n_sample=64, seed=5)
    x = jnp.asarray(ds[0]["rgbd"][None])
    m_sp = cspn_unet_resnet18(cspn_steps=8, cspn_backend="reference", subpixel=True)
    m_pl = cspn_unet_resnet18(cspn_steps=8, cspn_backend="reference", subpixel=False)
    v = m_sp.init(jax.random.PRNGKey(0), x)
    o_sp = np.asarray(m_sp.apply(v, x))
    o_pl = np.asarray(m_pl.apply(v, x))
    np.testing.assert_allclose(o_sp, o_pl, rtol=1e-4, atol=1e-5)
