"""Model zoo tests: shapes, geometry parameterization, train/eval modes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.models import (
    CSPNUNet,
    cspn_unet_resnet18,
    cspn_unet_resnet50,
    unet_baseline_resnet18,
)
from cspn_tpu.models.decoder import unpool2x
from cspn_tpu.models.unet import ceil_half_chain


def test_ceil_half_chain_matches_reference_nyu_geometry():
    # reference hard-codes 228x304 -> 114x152 -> 57x76 -> 29x38 -> 15x19
    # (torch_resnet_cspn_nyu.py:314-319); encoder bottleneck is 8x10
    sizes = ceil_half_chain(228, 304)
    assert sizes == [(228, 304), (114, 152), (57, 76), (29, 38), (15, 19), (8, 10)]


def test_unpool2x_zero_insert():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3, 1)
    y = unpool2x(x, 4, 6)
    y = np.asarray(y[0, :, :, 0])
    assert y[0, 0] == 0 and y[0, 2] == 1 and y[2, 4] == 5
    # odd positions zero
    assert y[1::2].sum() == 0 and y[:, 1::2].sum() == 0


def test_unpool2x_crop_odd_sizes():
    x = jnp.ones((1, 3, 4, 2))
    y = unpool2x(x, 5, 7)
    assert y.shape == (1, 5, 7, 2)


@pytest.mark.parametrize(
    "ctor,hw",
    [
        (cspn_unet_resnet18, (64, 96)),  # small KITTI-style geometry
        (cspn_unet_resnet50, (60, 80)),  # small NYU-style geometry
        (unet_baseline_resnet18, (64, 96)),
    ],
)
def test_model_forward_shapes(rng, ctor, hw):
    h, w = hw
    model = ctor(cspn_steps=2, cspn_backend="reference")
    x = jnp.asarray(rng.standard_normal((1, h, w, 4), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, h, w)
    assert np.isfinite(np.asarray(out)).all()


def test_model_train_mode_updates_batch_stats(rng):
    model = CSPNUNet(
        block="basic", layers=(1, 1, 1, 1), cspn_steps=1, train=True,
        cspn_backend="reference",
    )
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 4), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out, updates = model.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 32, 48)
    # running stats actually changed
    leaf0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    leaf1 = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_model_grad_flows_through_cspn(rng):
    model = CSPNUNet(
        block="basic", layers=(1, 1, 1, 1), cspn_steps=2, train=False,
        cspn_backend="reference",
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 4), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.mean(model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_upproj_block_2x(rng):
    import jax
    from cspn_tpu.models.decoder import UpProj

    x = jnp.asarray(rng.standard_normal((1, 8, 10, 16), dtype=np.float32))
    block = UpProj(features=8)
    v = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(v, x)
    assert y.shape == (1, 16, 20, 8)


def test_step_timer_and_profiling_utils():
    from cspn_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step(batch_size=2):
            pass
    assert len(t.times) == 3
    assert np.isfinite(t.frames_per_s)
    assert "steps=3" in t.summary()


def test_gudi_up_conv_block_subpixel_equivalence():
    """GudiUpConv (Simple_Gudi_UpConv_Block parity): fused subpixel form
    matches the plain unpool-then-conv composition with shared params."""
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models.decoder import GudiUpConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 6)), jnp.float32)
    plain = GudiUpConv(12, 15, 19, subpixel=False)
    fused = GudiUpConv(12, 15, 19, subpixel=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    a = plain.apply(v, x)
    b = fused.apply(v, x)
    assert a.shape == (2, 15, 19, 12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_heads_match_separate(rng):
    """The fused 9-channel head conv must reproduce the separate depth +
    affinity heads exactly (same params at the same tree paths)."""
    from cspn_tpu.models.unet import CSPNUNet

    x = jnp.asarray(rng.standard_normal((1, 32, 48, 4)).astype(np.float32))
    kw = dict(block="basic", layers=(1, 1, 1, 1), cspn_steps=2,
              cspn_backend="reference")
    fused = CSPNUNet(**kw, fuse_heads=True)
    plain = CSPNUNet(**kw, fuse_heads=False)
    v = fused.init(jax.random.PRNGKey(0), x)
    v2 = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))
    out_f = np.asarray(fused.apply(v, x))
    out_p = np.asarray(plain.apply(v, x))
    np.testing.assert_allclose(out_f, out_p, rtol=1e-5, atol=1e-6)


def test_subpixel_phase_split_exact():
    """The phase-SPLIT subpixel execution (features >= 128: one exact small
    conv per phase, no zero-padded tap slots) equals the unpool2x + kxk
    conv composition with the same 'kernel' parameter -- both k=5 decoder
    and k=3 head geometry."""
    import jax
    from cspn_tpu.models.decoder import SubpixelUnpoolConv, unpool2x

    rng = np.random.default_rng(11)
    for k, cin, cout in [(5, 16, 128), (3, 16, 128)]:
        h, w = 6, 7
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        m = SubpixelUnpoolConv(cout, k, 2 * h - 1, 2 * w - 1)
        v = m.init(jax.random.PRNGKey(0), x)
        y_split = m.apply(v, x)
        pad = (k - 1) // 2
        y_ref = jax.lax.conv_general_dilated(
            unpool2x(x, 2 * h - 1, 2 * w - 1), v["params"]["kernel"], (1, 1),
            ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
