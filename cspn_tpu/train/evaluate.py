"""Standalone evaluation driver (reference eval.py).

Loads best_model from cfg.best_model_dir, evaluates the val set, and -- since
the Bernoulli sparse input makes eval stochastic -- automates the reference
README's protocol of averaging over multiple runs with re-sampled sparse
points (cspn_pytorch/README.md:73): each run re-seeds the sparse sampler,
per-run and mean metrics are reported.  Optionally dumps
%05d_{input,gt,pred}.png for the first run (reference eval.py:160-161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cspn_tpu.config import RunConfig
from cspn_tpu.data import DataLoader
from cspn_tpu.train import checkpoint as ckpt_lib
from cspn_tpu.train.factory import build_dataset
from cspn_tpu.train.logging import format_error
from cspn_tpu.train.loop import build_model, make_eval_step
from cspn_tpu.train.metrics import METRIC_KEYS
from cspn_tpu.train.state import create_train_state
from cspn_tpu.utils.images import save_eval_images


def load_eval_state(
    cfg: RunConfig, checkpoint: str = "best_model", torch_checkpoint: str | None = None
):
    """Build the eval model and restore params/batch_stats from checkpoint.

    Returns (model, state, extra_vars): extra_vars carries derived-at-load
    serving variable collections (today: the pre-quantized int8 weight
    cache for dtype='int8' -- without it QuantConv re-quantizes ~218 M
    static weights inside every apply, which dominated b1 latency at 14 ms
    vs 2.7 ms bf16, result/latency_bench.json) and is {} otherwise.

    `torch_checkpoint` evaluates a checkpoint produced by the REFERENCE
    training code (best_model.pth, train.py:277-280) directly: the full
    state dict is converted (models/torch_import.convert_cspn_state_dict)
    and partial-restored; forward parity is pinned by
    tests/test_torch_oracle.py.
    """
    model = build_model(cfg, train=False)
    ds = build_dataset(cfg, "val", seed=0)
    sample = ds[0]
    x = jnp.asarray(sample["rgbd"][None])
    calib_x = None
    if cfg.model.dtype == "int8" and getattr(cfg.model, "act_static", False):
        # activation-scale calibration inputs: a handful of val frames
        calib_x = jnp.asarray(
            np.stack([ds[i]["rgbd"] for i in range(min(8, len(ds)))])
        )
    state = create_train_state(build_model(cfg, train=True), jax.random.PRNGKey(0), x)
    if torch_checkpoint:
        from cspn_tpu.models.torch_import import load_torch_cspn_checkpoint
        from cspn_tpu.train.state import partial_restore

        p_tree, s_tree = load_torch_cspn_checkpoint(torch_checkpoint)
        state = state.replace(
            params=partial_restore(state.params, p_tree, verbose=True),
            batch_stats=partial_restore(state.batch_stats, s_tree),
        )
        print(f"==> imported reference torch checkpoint {torch_checkpoint}")
        return model, state, _serving_extra_vars(cfg, model, state, x, calib_x)
    ckpt = ckpt_lib.CheckpointManager(cfg.best_model_dir)
    if ckpt.has(checkpoint):
        tree = ckpt_lib.state_to_tree(state, 0, float("inf"), cfg.optim.lr)
        restored = ckpt.restore(checkpoint, tree)
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        print(f"==> loaded {checkpoint} from {cfg.best_model_dir}")
    else:
        print(f"==> WARNING: no {checkpoint} in {cfg.best_model_dir}; random params")
    if cfg.model.dtype in ("bfloat16", "int8"):
        # serving precision: bf16-resident weights halve the decoder's ~1 GB
        # of per-batch parameter HBM traffic (utils/precision.py); training
        # checkpoints keep f32 masters, the cast happens at load time
        from cspn_tpu.utils.precision import cast_floating

        state = state.replace(
            params=cast_floating(state.params),
            batch_stats=cast_floating(state.batch_stats),
        )
    return model, state, _serving_extra_vars(cfg, model, state, x, calib_x)


def _serving_extra_vars(cfg, model, state, sample_x, calib_x=None) -> dict:
    """Derived-at-load serving collections: the int8 weight cache, plus
    (opt-in via cfg.model.act_static) calibrated static activation scales."""
    if cfg.model.dtype != "int8":
        return {}
    from cspn_tpu.utils.quant import build_act_calibration, build_weight_qcache

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    extra = {"qcache": build_weight_qcache(model, variables, sample_x)}
    print("==> cached int8 weight quantization (per-output-channel, load-time)")
    if getattr(cfg.model, "act_static", False):
        extra["acal"] = build_act_calibration(
            model,
            dict(variables, qcache=extra["qcache"]),
            [calib_x if calib_x is not None else sample_x],
        )
        print("==> calibrated static int8 activation scales (load-time)")
    return extra


def run_eval(
    cfg: RunConfig,
    runs: int = 5,
    dump_images: bool = False,
    checkpoint: str = "best_model",
    max_batches: int | None = None,
    torch_checkpoint: str | None = None,
) -> dict:
    model, state, extra_vars = load_eval_state(
        cfg, checkpoint, torch_checkpoint=torch_checkpoint
    )
    eval_step = make_eval_step(model, cfg.optim.loss)

    run_avgs = []
    for run in range(runs):
        ds = build_dataset(cfg, "val", seed=run, return_raw_rgb=dump_images and run == 0)
        loader = DataLoader(
            ds, cfg.data.batch_size_eval, num_workers=cfg.data.num_workers
        )
        sums = {k: 0.0 for k in METRIC_KEYS}
        total = 0
        index = 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            rgbd = jnp.asarray(batch["rgbd"])
            depth = jnp.asarray(batch["depth"])
            pred, loss, error = eval_step(state, rgbd, depth, extra_vars)
            bs = rgbd.shape[0]
            for k in METRIC_KEYS:
                sums[k] += float(error[k]) * bs
            total += bs
            if dump_images and run == 0:
                pred_np = np.asarray(pred)
                for j in range(bs):
                    save_eval_images(
                        cfg.data.dataset,
                        cfg.best_model_dir,
                        index,
                        batch.get("raw_rgb", batch["rgbd"][..., :3])[j],
                        np.asarray(depth[j]),
                        pred_np[j],
                        raw="raw_rgb" in batch,
                    )
                    index += 1
        avg = {k: sums[k] / max(total, 1) for k in METRIC_KEYS}
        run_avgs.append(avg)
        print(format_error(f"eval_run_{run}", 0, total, 0.0, avg, avg), flush=True)

    mean = {k: float(np.mean([a[k] for a in run_avgs])) for k in METRIC_KEYS}
    print(format_error(f"eval_mean_of_{runs}_runs", 0, 0, 0.0, mean, mean), flush=True)
    return {"runs": run_avgs, "mean": mean}
