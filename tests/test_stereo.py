"""Stereo + 3D CSPN path tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.models.stereo import (
    PSMNetCSPN,
    build_cost_volume,
    end_point_error,
    smooth_l1_disparity_loss,
)
from cspn_tpu.ops.resize import resize_bilinear, resize_trilinear


def test_cost_volume_shift_semantics(rng):
    fl = jnp.asarray(rng.standard_normal((1, 4, 6, 2), dtype=np.float32))
    fr = jnp.asarray(rng.standard_normal((1, 4, 6, 2), dtype=np.float32))
    cv = build_cost_volume(fl, fr, 3)
    assert cv.shape == (1, 3, 4, 6, 4)
    # d=0: right features unshifted
    np.testing.assert_array_equal(np.asarray(cv[0, 0, :, :, 2:]), np.asarray(fr[0]))
    # d=2: col w gets right col w-2; cols 0..1 zero
    np.testing.assert_array_equal(
        np.asarray(cv[0, 2, :, 2:, 2:]), np.asarray(fr[0, :, :4])
    )
    assert np.asarray(cv[0, 2, :, :2, 2:]).sum() == 0
    # left half always unshifted
    np.testing.assert_array_equal(np.asarray(cv[0, 2, :, :, :2]), np.asarray(fl[0]))


def test_resize_trilinear_recovers_constant():
    x = jnp.full((1, 4, 6, 8, 2), 2.5)
    y = resize_trilinear(x, (8, 12, 16))
    assert y.shape == (1, 8, 12, 16, 2)
    np.testing.assert_allclose(np.asarray(y), 2.5, rtol=1e-6)


def test_resize_bilinear_shape():
    x = jnp.ones((2, 10, 14, 3))
    assert resize_bilinear(x, (20, 28)).shape == (2, 20, 28, 3)


@pytest.mark.parametrize("use_cspn", [True, False])
def test_stereo_model_forward(rng, use_cspn):
    model = PSMNetCSPN(
        max_disp=16, features=8, cspn_steps=2, use_cspn=use_cspn, train=False
    )
    left = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right)
    disp = model.apply(variables, left, right)
    assert disp.shape == (1, 32, 48)
    d = np.asarray(disp)
    assert np.isfinite(d).all()
    assert (d >= 0).all() and (d <= 15.0 + 1e-4).all()  # convex comb of 0..D-1


def test_zero_init_guidance_is_identity_refinement(rng):
    """With guidance_zero_init=True the 3D CSPN refinement is an EXACT
    identity at init: the use_cspn model must reproduce the no-CSPN model
    bit-for-bit (the shared params get identical per-path init RNG).  Note
    this is an opt-in: the op's scale normalization makes zero a
    measure-zero identity point, see models/stereo.py."""
    left = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    kw = dict(max_disp=16, features=8, cspn_steps=4, train=False)
    base = PSMNetCSPN(**kw, use_cspn=False)
    cspn = PSMNetCSPN(**kw, use_cspn=True, guidance_zero_init=True)
    d_base = base.apply(base.init(jax.random.PRNGKey(0), left, right), left, right)
    d_cspn = cspn.apply(cspn.init(jax.random.PRNGKey(0), left, right), left, right)
    np.testing.assert_array_equal(np.asarray(d_base), np.asarray(d_cspn))


@pytest.mark.parametrize("stride,d", [(1, 6), (2, 6), (2, 5), (1, 1), (2, 1)])
def test_conv3d_batched2d_matches_native(rng, stride, d):
    """The flattened batched-2D formulation (kd taps folded into output
    channels + masked D-shift sum) equals lax's native 3D conv."""
    from cspn_tpu.models.stereo import conv3d_batched2d

    n, h, w, ci, co = 2, 5, 8, 7, 3
    x = jnp.asarray(rng.standard_normal((n, d, h, w, ci), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co), dtype=np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (stride,) * 3, ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = conv3d_batched2d(x.reshape(n * d, h, w, ci), k, d, stride)
    got = got.reshape(n, (d - 1) // stride + 1, (h - 1) // stride + 1, -1, co)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_stereo_model_bf16_mixed_precision(rng):
    """bf16 stereo variant: params stay f32 and interchangeable with the f32
    model; output is f32, finite, and tracks the f32 forward closely."""
    kw = dict(max_disp=16, features=8, cspn_steps=2, use_cspn=True, train=False)
    m32 = PSMNetCSPN(**kw)
    m16 = PSMNetCSPN(**kw, dtype=jnp.bfloat16)
    left = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((1, 32, 48, 3), dtype=np.float32))
    v = m32.init(jax.random.PRNGKey(0), left, right)
    v16 = m16.init(jax.random.PRNGKey(0), left, right)
    # identical param tree (paths, shapes, f32 storage) => checkpoints swap
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    flat16 = dict(jax.tree_util.tree_leaves_with_path(v16["params"]))
    assert set(flat16) == {p for p, _ in flat}
    for p, leaf in flat:
        assert flat16[p].shape == leaf.shape and flat16[p].dtype == jnp.float32
    d32 = m32.apply(v, left, right)
    d16 = m16.apply(v, left, right)  # same variables through the bf16 path
    assert d16.dtype == jnp.float32
    assert np.isfinite(np.asarray(d16)).all()
    # disparity in [0, 15]; bf16 convs move the regression only slightly
    assert float(jnp.max(jnp.abs(d16 - d32))) < 1.5


def test_stereo_loss_and_metrics(rng):
    gt = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8))).astype(np.float32) * 10)
    pred = gt + 1.0
    loss = float(smooth_l1_disparity_loss(pred, gt, 192.0))
    assert loss == pytest.approx(0.5, rel=1e-5)  # |d|=1 -> 1 - 0.5
    m = end_point_error(pred, gt, 192.0)
    assert float(m["EPE"]) == pytest.approx(1.0, rel=1e-5)
    assert float(m["3px"]) == 0.0


@pytest.mark.slow
def test_stereo_train_step_decreases_loss(rng):
    import optax

    model = PSMNetCSPN(max_disp=8, features=4, cspn_steps=1, train=True)
    left = jnp.asarray(rng.standard_normal((1, 16, 24, 3), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((1, 16, 24, 3), dtype=np.float32))
    gt = jnp.asarray(rng.uniform(1, 7, (1, 16, 24)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": stats}, left, right,
                mutable=["batch_stats"],
            )
            return smooth_l1_disparity_loss(out, gt, 8.0), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), updates["batch_stats"], opt_state2, loss

    losses = []
    for _ in range(5):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_stereo_trainer_end_to_end(tmp_path):
    from cspn_tpu.data import DataLoader
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.train.stereo_loop import StereoConfig, StereoTrainer

    cfg = StereoConfig(
        max_disp=8, features=4, cspn_steps=2, num_epochs=2, batch_size=2,
        save_dir=str(tmp_path / "stereo"),
    )
    from cspn_tpu.parallel import make_mesh

    ds = SyntheticStereoDataset(length=8, hw=(32, 48), max_disp=8)
    tl = DataLoader(ds, 2, shuffle=True, drop_last=True, num_workers=2)
    vl = DataLoader(ds, 2, num_workers=2)
    trainer = StereoTrainer(cfg, tl, vl, mesh=make_mesh(data=2, spatial=1))
    result = trainer.fit()
    assert np.isfinite(result["EPE"])
    assert trainer.ckpt.has("best_model")


def test_synthetic_stereo_dataset_geometry():
    from cspn_tpu.data.datasets import SyntheticStereoDataset

    s = SyntheticStereoDataset(length=2, hw=(20, 30), max_disp=8)[0]
    assert s["left"].shape == (20, 30, 3)
    assert s["right"].shape == (20, 30, 3)
    assert s["disp"].shape == (20, 30)
    assert (s["disp"] >= 1.0).all() and (s["disp"] <= 7.0).all()


def test_stereo_spatial_mesh_matches_unsharded():
    """PSMNetCSPN with the cost volume's D axis sharded over 'spatial'
    (halo-exchange 3D CSPN) produces the same disparity as unsharded."""
    import jax
    import jax.numpy as jnp

    from cspn_tpu.models.stereo import PSMNetCSPN
    from cspn_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, spatial=4)
    # random (non-zero) guidance: zero-init gates would make the CSPN an
    # identity and this equivalence check vacuous
    kw = dict(max_disp=32, features=4, cspn_steps=3, guidance_zero_init=False)
    plain = PSMNetCSPN(**kw)
    sharded = PSMNetCSPN(**kw, spatial_mesh=mesh, spatial_halo=2)

    rng = np.random.default_rng(5)
    left = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), left, right)

    want = jax.jit(plain.apply)(variables, left, right)
    got = jax.jit(sharded.apply)(variables, left, right)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_stereo_eval_driver_and_metrics(tmp_path):
    """eval-stereo path: D1/3px/EPE keys, checkpoint restore, PNG dumps
    (KITTI uint16 disp*256 convention)."""
    from cspn_tpu.data import DataLoader
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.parallel.mesh import make_mesh
    from cspn_tpu.train.stereo_loop import StereoConfig, StereoTrainer

    cfg = StereoConfig(max_disp=8, features=4, cspn_steps=2, num_epochs=1,
                       batch_size=2, save_dir=str(tmp_path / "ckpt"))
    ds = SyntheticStereoDataset(length=4, hw=(16, 24), max_disp=8, seed=0)
    loader = DataLoader(ds, 2)
    trainer = StereoTrainer(cfg, loader, loader,
                            mesh=make_mesh(data=2, spatial=1))
    trainer.fit(1)  # writes best_model
    out_dir = str(tmp_path / "dumps")
    mean = trainer.run_eval(dump_images=True, out_dir=out_dir)
    assert set(mean) == {"EPE", "3px", "D1"}
    assert 0.0 <= mean["D1"] <= 1.0 and 0.0 <= mean["3px"] <= 1.0
    assert mean["D1"] <= mean["3px"] + 1e-6  # D1 adds the 5% condition
    import os

    dumps = sorted(os.listdir(out_dir))
    assert "00000_disp.png" in dumps and "00000_gt.png" in dumps
    from PIL import Image
    import numpy as np

    gt_png = np.asarray(Image.open(os.path.join(out_dir, "00000_gt.png")))
    assert gt_png.dtype == np.uint16
    np.testing.assert_allclose(gt_png / 256.0, np.asarray(ds[0]["disp"]), atol=0.01)


def test_train_only_freezes_base_params(tmp_path):
    """StereoConfig.train_only: only params whose path contains the filter
    substring get optimizer updates (others: no update, no weight decay)."""
    from cspn_tpu.data import DataLoader
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.train.stereo_loop import StereoConfig, StereoTrainer

    from cspn_tpu.parallel import make_mesh

    cfg = StereoConfig(max_disp=8, features=4, cspn_steps=1, num_epochs=1,
                       batch_size=2, save_dir=str(tmp_path / "ckpt"),
                       train_only="guidance3d_head")
    ds = SyntheticStereoDataset(length=4, hw=(16, 24), max_disp=8, seed=0)
    t = StereoTrainer(cfg, DataLoader(ds, 2, drop_last=True), DataLoader(ds, 2),
                      mesh=make_mesh(data=2, spatial=1))
    before = jax.device_get(t.state.params)
    before_stats = jax.device_get(t.state.batch_stats)
    t.train_epoch(0)
    after = jax.device_get(t.state.params)
    changed = []
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(before),
        jax.tree_util.tree_leaves_with_path(after),
    ):
        path = jax.tree_util.keystr(p)
        if "guidance3d_head" in path:
            changed.append(path)
            assert not np.array_equal(np.asarray(a), np.asarray(b)), path
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)
    assert changed  # the head must actually train
    # frozen modules' BN running stats are pinned too (the base must not
    # drift under the head-only protocol; ADVICE r2)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(before_stats),
        jax.tree_util.tree_leaves_with_path(jax.device_get(t.state.batch_stats)),
    ):
        path = jax.tree_util.keystr(p)
        if "guidance3d_head" not in path:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)
