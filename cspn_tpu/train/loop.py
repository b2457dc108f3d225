"""Train/eval drivers (reference L3: train.py / eval.py).

TPU-native redesign of the reference's epoch loops:
  - one jit-compiled train step with donated state (fwd + masked-L1 + SGD),
  - data-parallel over the mesh 'data' axis: batches are sharded, params
    replicated, XLA inserts the gradient all-reduce; BatchNorm batch
    statistics are computed over the *global* batch under GSPMD (sync-BN);
  - metrics are jittable on-device reductions accumulated asynchronously
    (the reference synced to CPU every step, train.py:204-206),
  - best-RMSE tracking + Orbax checkpoints + plateau LR on val MAE,
    TSV/console logs format-compatible with the reference.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cspn_tpu.config import RunConfig
from cspn_tpu.models import unet as unet_lib
from cspn_tpu.train import checkpoint as ckpt_lib
from cspn_tpu.train.logging import TsvLogger, format_error
from cspn_tpu.train.loss import berhu_loss, masked_l1_loss
from cspn_tpu.train.lr_schedule import ReduceLROnPlateau
from cspn_tpu.train.metrics import METRIC_KEYS, evaluate_error
from cspn_tpu.train.state import (
    TrainState,
    create_train_state,
    get_learning_rate,
    partial_restore,
    set_learning_rate,
)
from cspn_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def build_model(cfg: RunConfig, train: bool):
    block, layers = unet_lib._LAYERS[int(cfg.model.arch.replace("resnet", ""))]
    dtype = None
    if cfg.model.dtype in ("bfloat16", "bf16", "int8"):
        dtype = jnp.bfloat16  # int8 serving dequantizes into bf16
    # 'int8' is serving-only (round() has zero gradient): train steps --
    # including the train=True model used to init eval state -- stay bf16
    quant = cfg.model.dtype == "int8" and not train
    return unet_lib.CSPNUNet(
        block=block,
        layers=layers,
        cspn_steps=cfg.model.cspn_steps,
        cspn_norm_type=cfg.model.cspn_norm_type,
        use_cspn=cfg.model.use_cspn,
        train=train,
        cspn_backend=cfg.model.cspn_backend,
        dtype=dtype,
        quant=quant,
        quant_exclude=tuple(getattr(cfg.model, "quant_exclude",
                                    ("gud_up_proj_layer4",))),
        cspn_io_dtype=(
            jnp.bfloat16
            if getattr(cfg.model, "cspn_io_dtype", None) in ("bfloat16", "bf16")
            else None
        ),
    )


def _loss_fn(name: str) -> Callable:
    return {"l1": masked_l1_loss, "berhu": berhu_loss}[name]


def make_train_step(model_train, loss_name: str = "l1"):
    loss_fn = _loss_fn(loss_name)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, rgbd, depth):
        def compute_loss(params):
            out, updates = model_train.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgbd,
                mutable=["batch_stats"],
            )
            return loss_fn(out, depth), (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads).replace(
            batch_stats=updates["batch_stats"]
        )
        return state, loss, evaluate_error(depth, out)

    return train_step


def make_shard_map_train_step(
    model_train,
    mesh,
    loss_name: str = "l1",
    grad_reduce_dtype=None,
    data_axis: str = "data",
):
    """Explicit-collective variant of `make_train_step` for data-parallel
    meshes, built with `shard_map` instead of GSPMD auto-sharding.

    Why it exists: under GSPMD the gradient all-reduce is implicit and runs
    at the gradient dtype (f32 for f32 masters) — 0.87 GB per step on the
    flagship (docs/SCALING.md cost model 1).  Making the `psum` explicit
    lets us cast gradients to `grad_reduce_dtype` (e.g. bfloat16) before
    the reduce, halving the ICI bytes, and cast back before the optimizer
    update.  Reduction numerics change (bf16 summands); at reference batch
    sizes the error is far below gradient noise (pinned in
    tests/test_parallel.py against the GSPMD step).

    Semantic difference vs the GSPMD step: BatchNorm statistics are
    per-replica (each shard normalizes with its local batch stats; the
    running stats are the pmean of the per-shard updates).  That is exactly
    the reference's `torch.nn.DataParallel` BN behavior (train.py:162-166),
    whereas the GSPMD step gives true sync-BN.

    Only data-parallel meshes are supported (the in-model spatially-sharded
    CSPN path already uses shard_map internally and cannot nest).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if "spatial" in mesh.shape and mesh.shape["spatial"] != 1:
        raise ValueError(
            "make_shard_map_train_step supports data-only meshes; "
            "use the GSPMD step (make_train_step) with spatial sharding"
        )
    loss_fn = _loss_fn(loss_name)

    def per_shard(state: TrainState, rgbd, depth):
        def compute_loss(params):
            out, updates = model_train.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgbd,
                mutable=["batch_stats"],
            )
            return loss_fn(out, depth), (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        if grad_reduce_dtype is not None:
            dt = jnp.dtype(grad_reduce_dtype)
            grads = jax.tree.map(lambda g: g.astype(dt), grads)
        grads = jax.lax.pmean(grads, data_axis)
        grads = jax.tree.map(
            lambda g, p: g.astype(p.dtype), grads, state.params
        )
        new_stats = jax.lax.pmean(updates["batch_stats"], data_axis)
        new_state = state.apply_gradients(grads=grads).replace(
            batch_stats=new_stats
        )
        loss = jax.lax.pmean(loss, data_axis)
        error = jax.lax.pmean(evaluate_error(depth, out), data_axis)
        # RMSE = sqrt(mean) is nonlinear: recompute from the reduced MSE so
        # it reports the global-batch statistic like the GSPMD step (iRMSE
        # stays the mean of per-shard values — the same quirk as the
        # reference's avg_error over sub-batches, utils.py:50-57)
        error["RMSE"] = jnp.sqrt(error["MSE"])
        return new_state, loss, error

    data_spec = P(data_axis)
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), data_spec, data_spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, rgbd, depth):
        return sharded(state, rgbd, depth)

    return train_step


def make_eval_step(model_eval, loss_name: str = "l1"):
    loss_fn = _loss_fn(loss_name)

    @jax.jit
    def eval_step(state: TrainState, rgbd, depth, extra_vars=None):
        # extra_vars: optional additional variable collections, e.g. the
        # serving-time pre-quantized weight cache ({'qcache': ...},
        # utils/quant.build_weight_qcache).  Passed as an argument, not a
        # closure: closed-over concrete arrays would embed ~200 MB of
        # weights as HLO constants.
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if extra_vars:
            variables.update(extra_vars)
        out = model_eval.apply(variables, rgbd)
        return out, loss_fn(out, depth), evaluate_error(depth, out)

    return eval_step


class _DeviceAverager:
    """Batch-weighted metric averaging with device-side accumulation
    (no per-step host sync; float conversion only on read)."""

    def __init__(self):
        self.sums = {k: jnp.zeros(()) for k in METRIC_KEYS}
        self.total = 0

    def update(self, error: dict, batch_size: int):
        self.sums = {k: self.sums[k] + error[k] * batch_size for k in METRIC_KEYS}
        self.total += batch_size

    @property
    def average(self) -> dict:
        t = max(self.total, 1)
        return {k: float(v) / t for k, v in self.sums.items()}


class Trainer:
    def __init__(
        self,
        cfg: RunConfig,
        train_loader,
        val_loader,
        mesh=None,
        pretrained_params=None,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh if mesh is not None else make_mesh(spatial=1)
        self.model_train = build_model(cfg, train=True)
        self.model_eval = build_model(cfg, train=False)

        sample = next(iter(val_loader))
        sample_input = jnp.asarray(sample["rgbd"][:1])
        state = create_train_state(
            self.model_train,
            jax.random.PRNGKey(0),
            sample_input,
            learning_rate=cfg.optim.lr,
            momentum=cfg.optim.momentum,
            weight_decay=cfg.optim.weight_decay,
            nesterov=cfg.optim.nesterov,
            dampening=cfg.optim.dampening,
            momentum_dtype=cfg.optim.momentum_dtype,
        )
        if pretrained_params is not None:
            if isinstance(pretrained_params, tuple):  # (params, batch_stats)
                p_tree, s_tree = pretrained_params
                state = state.replace(
                    params=partial_restore(state.params, p_tree, verbose=True),
                    batch_stats=partial_restore(state.batch_stats, s_tree),
                )
            else:
                state = state.replace(
                    params=partial_restore(state.params, pretrained_params, verbose=True)
                )
        self.state = replicate(state, self.mesh)

        self.scheduler = ReduceLROnPlateau(
            cfg.optim.lr,
            factor=cfg.optim.plateau_factor,
            patience=cfg.optim.plateau_patience,
            min_lr=cfg.optim.plateau_min_lr,
        )
        self.best_rmse = float("inf")
        self.ckpt = ckpt_lib.CheckpointManager(cfg.save_dir)
        self.logger = TsvLogger(cfg.save_dir)
        reduce_dt = getattr(cfg.optim, "grad_reduce_dtype", None)
        if reduce_dt and self.mesh.shape.get("spatial", 1) == 1:
            self.train_step = make_shard_map_train_step(
                self.model_train,
                self.mesh,
                cfg.optim.loss,
                grad_reduce_dtype=reduce_dt,
            )
        else:
            if reduce_dt:
                print(
                    "# grad_reduce_dtype ignored: shard_map step needs a "
                    "data-only mesh (spatial=1)",
                    flush=True,
                )
            self.train_step = make_train_step(self.model_train, cfg.optim.loss)
        self.eval_step = make_eval_step(self.model_eval, cfg.optim.loss)
        self.epoch = 0

    # -- reference train.py:151-159 resume-from-best (full state here) ------
    def resume(self, name: str = "best_model"):
        tree = ckpt_lib.state_to_tree(
            self.state, self.epoch, self.best_rmse, self.scheduler.lr
        )
        restored = self.ckpt.restore(name, tree)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        self.epoch = int(restored["epoch"]) + 1
        self.best_rmse = float(restored["best_rmse"])
        self.scheduler.lr = float(restored["lr"])
        self.state = replicate(self.state, self.mesh)

    def train_epoch(self, epoch: int) -> dict:
        from cspn_tpu.utils.profiling import StepTimer

        avg = _DeviceAverager()
        timer = StepTimer(warmup=2)
        last_loss = 0.0
        for step, batch in enumerate(self.train_loader):
            sharded = shard_batch(
                {"rgbd": batch["rgbd"], "depth": batch["depth"]}, self.mesh
            )
            with timer.step(batch["rgbd"].shape[0]):
                self.state, loss, error = self.train_step(
                    self.state, sharded["rgbd"], sharded["depth"]
                )
            avg.update(error, batch["rgbd"].shape[0])
            if step % self.cfg.log_every == 0:
                last_loss = float(loss)
                err_now = {k: float(v) for k, v in error.items()}
                print(
                    format_error(
                        "train", epoch, step, last_loss, err_now, avg.average
                    ),
                    flush=True,
                )
        error_avg = avg.average
        print(f"epoch {epoch} train {timer.summary()}", flush=True)
        self.logger.log("train", epoch, self.scheduler.lr, False, error_avg)
        self.ckpt.save_epoch(
            ckpt_lib.state_to_tree(self.state, epoch, self.best_rmse, self.scheduler.lr),
            epoch,
        )
        return error_avg

    def validate(self, epoch: int) -> dict:
        avg = _DeviceAverager()
        for batch in self.val_loader:
            rgbd = jnp.asarray(batch["rgbd"])
            depth = jnp.asarray(batch["depth"])
            _, loss, error = self.eval_step(self.state, rgbd, depth)
            avg.update(error, rgbd.shape[0])
        error_avg = avg.average
        is_best = error_avg["RMSE"] < self.best_rmse
        if is_best:
            self.best_rmse = error_avg["RMSE"]
            self.ckpt.save_best(
                ckpt_lib.state_to_tree(self.state, epoch, self.best_rmse, self.scheduler.lr)
            )
        print(
            format_error("eval", epoch, 0, float(loss), error_avg, error_avg),
            flush=True,
        )
        self.logger.log("eval", epoch, self.scheduler.lr, is_best, error_avg)
        # plateau LR on val MAE (reference train.py:283)
        new_lr = self.scheduler.step(error_avg["MAE"])
        self.state = set_learning_rate(self.state, new_lr)
        return error_avg

    def fit(self, num_epochs: Optional[int] = None) -> dict:
        num_epochs = num_epochs or self.cfg.optim.num_epochs
        last_val: dict = {}
        for epoch in range(self.epoch, num_epochs):
            t0 = time.time()
            self.train_epoch(epoch)
            last_val = self.validate(epoch)
            self.epoch = epoch + 1
            print(
                f"epoch {epoch} done in {time.time() - t0:.1f}s "
                f"(lr={self.scheduler.lr:g}, best RMSE={self.best_rmse:.4f})",
                flush=True,
            )
        return last_val
