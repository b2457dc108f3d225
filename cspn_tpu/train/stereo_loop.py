"""Stereo training driver (BASELINE config 5: PSMNet-style + 3D CSPN).

The reference's stereo trainer was never released (cspn_paddle/README.md
documents the CLI only, :104-151); this driver provides the capability with
the same runtime structure as the depth-completion Trainer: jitted donated
train step, data-parallel mesh sharding, Orbax checkpoints, TSV logs,
best-EPE tracking.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cspn_tpu.models.stereo import (
    PSMNetCSPN,
    end_point_error,
    smooth_l1_disparity_loss,
)
from cspn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cspn_tpu.train import checkpoint as ckpt_lib
from cspn_tpu.train.state import TrainState, make_optimizer


@dataclasses.dataclass
class StereoConfig:
    max_disp: int = 192
    features: int = 32
    cspn_steps: int = 24
    use_cspn: bool = True
    dtype: str = "float32"  # 'float32' | 'bfloat16' (mixed-precision convs)
    lr: float = 1e-3
    num_epochs: int = 10
    batch_size: int = 4
    save_dir: str = "result/stereo_cspn"
    # when set, ONLY params whose tree path contains this substring are
    # trained (others get optax.set_to_zero -- no update, no weight decay)
    # and the frozen modules' BatchNorm running stats are pinned too: the
    # staged-refinement protocol of training just the fresh guidance3d_head
    # on a frozen pretrained base
    train_only: Optional[str] = None
    # zero-init the 3D guidance head so the CSPN refinement starts as an
    # exact identity on the base output (sensible for the frozen-base
    # protocol; measured worse for full fine-tuning -- see README)
    guidance_zero_init: bool = False


def build_stereo_model(cfg: StereoConfig, train: bool) -> PSMNetCSPN:
    return PSMNetCSPN(
        max_disp=cfg.max_disp,
        features=cfg.features,
        cspn_steps=cfg.cspn_steps,
        use_cspn=cfg.use_cspn,
        dtype=jnp.bfloat16 if cfg.dtype in ("bfloat16", "bf16") else None,
        train=train,
        guidance_zero_init=cfg.guidance_zero_init,
    )


def make_stereo_train_step(
    model: PSMNetCSPN, max_disp: float, train_only: Optional[str] = None
):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, left, right, disp):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                left,
                right,
                mutable=["batch_stats"],
            )
            return smooth_l1_disparity_loss(out, disp, max_disp), (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_stats = updates["batch_stats"]
        if train_only is not None:
            # frozen modules keep their pretrained running stats: the
            # train-mode forward would otherwise drift them while their
            # params stay fixed (train normalizes with batch stats, eval
            # with the drifted running stats -- breaking head-only isolation)
            new_stats = jax.tree_util.tree_map_with_path(
                lambda p, old, new: new
                if train_only in jax.tree_util.keystr(p)
                else old,
                state.batch_stats,
                new_stats,
            )
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
        return state, loss, end_point_error(out, disp, max_disp)

    return step


def make_stereo_eval_step(model: PSMNetCSPN, max_disp: float):
    @jax.jit
    def step(state: TrainState, left, right, disp):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, left, right
        )
        return out, smooth_l1_disparity_loss(out, disp, max_disp), end_point_error(
            out, disp, max_disp
        )

    return step


class StereoTrainer:
    def __init__(self, cfg: StereoConfig, train_loader, val_loader, mesh=None):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh if mesh is not None else make_mesh(spatial=1)
        self.model_train = build_stereo_model(cfg, True)
        self.model_eval = build_stereo_model(cfg, False)

        sample = next(iter(val_loader))
        left = jnp.asarray(sample["left"][:1])
        right = jnp.asarray(sample["right"][:1])
        variables = self.model_train.init(jax.random.PRNGKey(0), left, right)
        tx = make_optimizer(cfg.lr, momentum=0.9, weight_decay=1e-4,
                            nesterov=False)
        if cfg.train_only:
            labels = jax.tree_util.tree_map_with_path(
                lambda p, _: "train"
                if cfg.train_only in jax.tree_util.keystr(p)
                else "freeze",
                variables["params"],
            )
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels
            )
        state = TrainState.create(
            apply_fn=self.model_train.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=tx,
        )
        self.state = replicate(state, self.mesh)
        self.train_step = make_stereo_train_step(
            self.model_train, cfg.max_disp, train_only=cfg.train_only
        )
        self.eval_step = make_stereo_eval_step(self.model_eval, cfg.max_disp)
        self.ckpt = ckpt_lib.CheckpointManager(cfg.save_dir)
        self.best_epe = float("inf")
        self.epoch = 0

    def train_epoch(self, epoch: int) -> float:
        losses = []
        for batch in self.train_loader:
            b = shard_batch(
                {k: batch[k] for k in ("left", "right", "disp")}, self.mesh
            )
            self.state, loss, _ = self.train_step(
                self.state, b["left"], b["right"], b["disp"]
            )
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        print(f"stereo epoch {epoch}: train loss {mean_loss:.4f}", flush=True)
        return mean_loss

    def validate(self, epoch: int) -> dict:
        sums = {"EPE": [], "3px": [], "D1": []}
        for batch in self.val_loader:
            _, _, m = self.eval_step(
                self.state,
                jnp.asarray(batch["left"]),
                jnp.asarray(batch["right"]),
                jnp.asarray(batch["disp"]),
            )
            for k in sums:
                sums[k].append(m[k])
        epe = float(jnp.mean(jnp.stack(sums["EPE"])))
        px3 = float(jnp.mean(jnp.stack(sums["3px"])))
        d1 = float(jnp.mean(jnp.stack(sums["D1"])))
        print(
            f"stereo epoch {epoch}: val EPE {epe:.3f} 3px {px3:.4f} D1 {d1:.4f}",
            flush=True,
        )
        if epe < self.best_epe:
            self.best_epe = epe
            self.ckpt.save_best(
                {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "epoch": np.asarray(epoch),
                    "best_epe": np.asarray(self.best_epe),
                }
            )
        return {"EPE": epe, "3px": px3, "D1": d1}

    def run_eval(
        self,
        checkpoint: str = "best_model",
        dump_images: bool = False,
        out_dir: Optional[str] = None,
    ) -> dict:
        """Standalone stereo eval: restore `checkpoint` from save_dir (if
        present), compute EPE / >3px / D1 over the val loader, optionally
        dump %05d_disp.png predictions (KITTI uint16 disparity*256
        convention) and %05d_gt.png.  Covers the eval half of the stereo
        capability the reference documents but never released
        (cspn_paddle/README.md:104-151: --model=stereo)."""
        if self.ckpt.has(checkpoint):
            tree = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "epoch": np.asarray(0),
                "best_epe": np.asarray(0.0),
            }
            restored = self.ckpt.restore(checkpoint, tree)
            self.state = self.state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"]
            )
            print(f"==> loaded {checkpoint} from {self.cfg.save_dir}", flush=True)
        sums = {"EPE": 0.0, "3px": 0.0, "D1": 0.0}
        total = 0
        index = 0
        out_dir = out_dir or f"{self.cfg.save_dir}/eval_result"
        for batch in self.val_loader:
            left = jnp.asarray(batch["left"])
            pred, _, m = self.eval_step(
                self.state, left, jnp.asarray(batch["right"]),
                jnp.asarray(batch["disp"]),
            )
            bs = left.shape[0]
            for k in sums:
                sums[k] += float(m[k]) * bs
            total += bs
            if dump_images:
                import os

                from PIL import Image

                os.makedirs(out_dir, exist_ok=True)
                pred_np = np.asarray(pred)
                for j in range(bs):
                    for tag, img in (
                        ("disp", pred_np[j]),
                        ("gt", np.asarray(batch["disp"][j])),
                    ):
                        u16 = np.clip(img * 256.0, 0, 65535).astype(np.uint16)
                        Image.fromarray(u16).save(
                            f"{out_dir}/{index:05d}_{tag}.png"
                        )
                    index += 1
        mean = {k: sums[k] / max(total, 1) for k in sums}
        print(
            "stereo eval: EPE {EPE:.3f}  3px {3px:.4f}  D1 {D1:.4f}".format(**mean),
            flush=True,
        )
        return mean

    def fit(self, num_epochs: Optional[int] = None) -> dict:
        num_epochs = num_epochs or self.cfg.num_epochs
        result = {}
        for epoch in range(self.epoch, num_epochs):
            t0 = time.time()
            self.train_epoch(epoch)
            result = self.validate(epoch)
            self.epoch = epoch + 1
            print(f"stereo epoch {epoch} done in {time.time() - t0:.1f}s", flush=True)
        return result
