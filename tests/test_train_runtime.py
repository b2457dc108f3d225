"""Runtime tests: metrics vs a direct numpy transcription of utils.py,
losses, plateau LR schedule, partial restore, checkpointing, and an
end-to-end smoke train on the synthetic dataset."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.train import (
    ErrorAverager,
    ReduceLROnPlateau,
    berhu_loss,
    evaluate_error,
    masked_l1_loss,
    partial_restore,
)


def _ref_metrics(gt, pred):
    """Numpy transcription of reference utils.evaluate_error (utils.py:19-47)."""
    mask = gt > 1e-4
    g, p = gt[mask], pred[mask]
    n = g.size
    diff = np.abs(g - p)
    out = {}
    out["MSE"] = (diff**2).sum() / n
    out["RMSE"] = math.sqrt(out["MSE"])
    out["MAE"] = diff.sum() / n
    out["ABS_REL"] = (diff / g).sum() / n
    ratio = np.maximum(g / p, p / g)
    for t, k in [
        (1.02, "DELTA1.02"),
        (1.05, "DELTA1.05"),
        (1.10, "DELTA1.10"),
        (1.25, "DELTA1.25"),
        (1.25**2, "DELTA1.25^2"),
        (1.25**3, "DELTA1.25^3"),
    ]:
        out[k] = (ratio < t).sum() / n
    return out


def test_evaluate_error_matches_reference_semantics(rng):
    gt = np.abs(rng.standard_normal((2, 10, 12))).astype(np.float32)
    gt[0, :3] = 0.0  # invalid region
    pred = np.abs(rng.standard_normal((2, 10, 12))).astype(np.float32)
    want = _ref_metrics(gt, pred)
    got = {k: float(v) for k, v in evaluate_error(jnp.asarray(gt), jnp.asarray(pred)).items()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-5), k


def test_lg10_metric(rng):
    # LG10 = mean |log10 gt - log10 pred| over valid pixels with pred > 0
    # (reference declares the key but never computes it, utils.py:23-25)
    gt = np.abs(rng.standard_normal((6, 7))).astype(np.float32) + 0.5
    pred = np.abs(rng.standard_normal((6, 7))).astype(np.float32) + 0.5
    gt[0, :4] = 0.0  # invalid gt
    pred[1, :4] = 0.0  # non-positive pred masked from LG10
    pos = (gt > 1e-4) & (pred > 1e-4)
    want = np.abs(np.log10(gt[pos]) - np.log10(pred[pos])).mean()
    got = float(evaluate_error(jnp.asarray(gt), jnp.asarray(pred))["LG10"])
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_l1_matches_reference(rng):
    label = np.abs(rng.standard_normal((2, 8, 8))).astype(np.float32)
    label[:, :2] = 0.0
    pred = rng.standard_normal((2, 8, 8)).astype(np.float32)
    mask = label > 1e-4
    want = np.abs(pred - label)[mask].sum() / mask.sum()
    got = float(masked_l1_loss(jnp.asarray(pred), jnp.asarray(label)))
    assert got == pytest.approx(want, rel=1e-6)


def test_berhu_loss_formula(rng):
    label = np.abs(rng.standard_normal((4, 4))).astype(np.float32) + 1.0
    pred = label + rng.uniform(-0.1, 0.1, (4, 4)).astype(np.float32)
    pred[0, 0] = label[0, 0] + 1.0  # outlier sets the threshold c
    diff = np.abs(pred - label)
    c = 0.2 * diff.max()
    want = np.where(diff <= c, diff, (diff**2 + c**2) / (2 * c)).mean()
    got = float(berhu_loss(jnp.asarray(pred), jnp.asarray(label)))
    assert got == pytest.approx(want, rel=1e-5)
    # small-error pixels are penalized linearly (L1 branch active)
    assert (diff <= c).sum() > 10


def test_error_averager_batch_weighting():
    a = ErrorAverager()
    e1 = {k: 1.0 for k in a.sums}
    e2 = {k: 3.0 for k in a.sums}
    a.update(e1, 2)
    avg = a.update(e2, 6)
    assert avg["RMSE"] == pytest.approx((1 * 2 + 3 * 6) / 8)


def test_plateau_schedule_reference_behavior():
    s = ReduceLROnPlateau(0.01, patience=3)
    lrs = [s.step(1.0) for _ in range(5)]
    # best=1.0 at step1; steps 2..5 no improvement; wait hits patience at step 5
    assert lrs[:4] == [0.01] * 4
    assert lrs[4] == pytest.approx(0.001)
    # improvement resets
    assert s.step(0.5) == pytest.approx(0.001)
    for _ in range(4):
        lr = s.step(0.5)
    assert lr == pytest.approx(1e-4)
    # floor at min_lr
    for _ in range(40):
        lr = s.step(0.5)
    assert lr >= s.min_lr


def test_partial_restore_shapes_and_paths():
    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3), "d": np.zeros(4)}}
    source = {"a": np.ones((2, 2)), "b": {"c": np.ones(5)}}  # c: shape mismatch
    out = partial_restore(target, source)
    assert (out["a"] == 1).all()
    assert (out["b"]["c"] == 0).all()  # mismatched shape kept target
    assert (out["b"]["d"] == 0).all()


def test_bf16_momentum_accumulator():
    """momentum_dtype='bfloat16' stores the SGD momentum buffer in bf16 but
    produces updates close to the f32 optimizer (update math stays f32)."""
    from cspn_tpu.train.state import make_optimizer

    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal((16, 16)), jnp.float32)}
    grads = {"w": jnp.asarray(np.random.default_rng(1).standard_normal((16, 16)), jnp.float32)}

    import optax

    tx32 = make_optimizer(0.01)
    tx16 = make_optimizer(0.01, momentum_dtype="bfloat16")
    s32, s16 = tx32.init(params), tx16.init(params)
    p32, p16 = params, params
    for _ in range(5):
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u16)
    # buffer dtype really is bf16
    mom = [x for x in jax.tree_util.tree_leaves(s16) if getattr(x, "shape", None) == (16, 16)]
    assert any(x.dtype == jnp.bfloat16 for x in mom)
    # trajectories agree to bf16 rounding of the momentum term
    err = float(jnp.max(jnp.abs(p32["w"] - p16["w"])))
    scale = float(jnp.max(jnp.abs(p32["w"] - params["w"])))
    assert err < 0.02 * scale, (err, scale)


@pytest.mark.slow
def test_end_to_end_smoke_train(tmp_path):
    """One epoch on the synthetic dataset: loss finite, checkpoint written,
    resume restores state."""
    from cspn_tpu.config import PRESETS
    import dataclasses

    from cspn_tpu.data import DataLoader, SyntheticDepthDataset
    from cspn_tpu.train.loop import Trainer
    from cspn_tpu.parallel import make_mesh

    cfg = dataclasses.replace(
        PRESETS["synthetic_smoke"],
        save_dir=str(tmp_path / "run"),
        best_model_dir=str(tmp_path / "run"),
        log_every=2,
    )
    ds = SyntheticDepthDataset(length=8, hw=(32, 48), n_sample=64)
    train_loader = DataLoader(ds, batch_size=4, drop_last=True, num_workers=2)
    val_loader = DataLoader(ds, batch_size=4, num_workers=2)
    mesh = make_mesh(data=2, spatial=1)
    trainer = Trainer(cfg, train_loader, val_loader, mesh=mesh)
    result = trainer.fit(1)
    assert np.isfinite(result["RMSE"])
    assert trainer.ckpt.has("best_model")
    assert trainer.ckpt.latest_epoch() == 0

    # resume into a fresh trainer
    trainer2 = Trainer(cfg, train_loader, val_loader, mesh=mesh)
    trainer2.resume("best_model")
    assert trainer2.epoch == 1
    assert trainer2.best_rmse == pytest.approx(trainer.best_rmse)
    p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_bf16_serving_cast_and_apply():
    """cast_floating converts all float leaves; a bf16-dtype model applies
    with bf16-resident params and returns f32 depth (the serving config
    bench.py measures)."""
    import jax.numpy as jnp

    from cspn_tpu.models import cspn_unet_resnet18
    from cspn_tpu.utils.precision import cast_floating

    x = jnp.zeros((1, 32, 48, 4), jnp.float32)
    m32 = cspn_unet_resnet18(cspn_steps=4)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    v16 = cast_floating(v, jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(v16)
    assert all(
        l.dtype == jnp.bfloat16
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    )
    m16 = cspn_unet_resnet18(cspn_steps=4, dtype=jnp.bfloat16)
    y16 = jax.jit(m16.apply)(v16, x + 1.0)
    assert y16.dtype == jnp.float32 and y16.shape == (1, 32, 48)
    y32 = jax.jit(m32.apply)(v, x + 1.0)
    # same math modulo bf16 rounding
    assert float(jnp.max(jnp.abs(y16 - y32))) < 0.1 * float(
        jnp.max(jnp.abs(y32)) + 1e-6
    )


def test_dampened_sgd_matches_torch():
    """--dampening follows torch.optim.SGD exactly (incl. the first-step
    buf = g special case, reference train.py:41 exposes the flag)."""
    import torch

    from cspn_tpu.train.state import make_optimizer

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    grads = [rng.standard_normal((5, 3)).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=1e-4,
                           dampening=0.3, nesterov=False)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer(0.1, momentum=0.9, weight_decay=1e-4,
                         nesterov=False, dampening=0.3)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    for g in grads:
        upd, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )

    with pytest.raises(ValueError):
        make_optimizer(0.1, nesterov=True, dampening=0.3).init(params)
