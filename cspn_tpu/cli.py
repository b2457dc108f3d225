"""Command-line interface (reference L5: train.py/eval.py argparse + the
bash wrapper scripts).

    python -m cspn_tpu train --preset nyu_train [overrides]
    python -m cspn_tpu eval  --preset nyu_eval --runs 5 --dump-images
    python -m cspn_tpu demo  --dim-num 3 --prop-step 24      (paddle demo)
    python -m cspn_tpu bench
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _add_common_overrides(p: argparse.ArgumentParser):
    p.add_argument("--preset", default=None, help="named config preset")
    p.add_argument("--data-set", dest="dataset", default=None,
                   choices=["nyudepth", "kitti", "synthetic"])
    p.add_argument("--train-list", default=None)
    p.add_argument("--eval-list", default=None)
    p.add_argument("--root-dir", default=None)
    p.add_argument("--n-sample", type=int, default=None)
    p.add_argument("--input-format", dest="input_format", default=None,
                   choices=["hdf5", "img"],
                   help="hdf5: one-column manifest of .h5 frames; "
                        "img: two-column manifest of (rgb, depth) images")
    p.add_argument("--batch-size-train", type=int, default=None)
    p.add_argument("--batch-size-eval", type=int, default=None)
    p.add_argument("--num-workers", dest="num_workers", type=int, default=None,
                   help="loader workers (reference train.py:117 workers=2)")
    p.add_argument("--worker-mode", dest="worker_mode", default=None,
                   choices=["thread", "process"],
                   help="loader worker model; 'process' scales the "
                        "Python-heavy augmentation past the GIL")
    p.add_argument("--model", default=None, help="resnet18|34|50|101|152")
    p.add_argument("--no-cspn", action="store_true", help="baseline model")
    p.add_argument("--cspn-step", type=int, default=None)
    p.add_argument("--cspn-norm-type", default=None, choices=["8sum", "8sum_abs"])
    p.add_argument("--cspn-backend", default=None,
                   choices=["auto", "pallas", "reference"])
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--act-static", dest="act_static", action="store_true",
                   help="int8 serving: calibrate static activation scales "
                        "at load (removes the per-call abs-max reduce over "
                        "every quantized conv input; metric-gated in "
                        "result/int8_eval.json)")
    p.add_argument("--cspn-io-dtype", dest="cspn_io_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="HBM I/O dtype of the fused CSPN kernel (bfloat16 "
                        "halves its gate/depth read traffic; in-VMEM "
                        "arithmetic stays f32)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--momentum", type=float, default=None)
    p.add_argument("--weight-decay", dest="weight_decay", type=float, default=None)
    p.add_argument("--dampening", type=float, default=None,
                   help="SGD dampening (torch semantics; requires --no-nesterov)")
    p.add_argument("--nesterov", "-n", dest="nesterov", action="store_true",
                   default=None, help="enable Nesterov momentum (preset default)")
    p.add_argument("--no-nesterov", dest="nesterov", action="store_false",
                   help="plain momentum SGD")
    p.add_argument("--num-epoch", type=int, default=None)
    p.add_argument("--loss", default=None, choices=["l1", "berhu"])
    p.add_argument("--save-dir", default=None)
    p.add_argument("--best-model-dir", default=None)
    p.add_argument("--resume", "-r", action="store_true")
    p.add_argument("--pretrain-path", default=None,
                   help="torch-format .pth with pretrained encoder weights")
    p.add_argument("--grad-reduce-dtype", dest="grad_reduce_dtype", default=None,
                   choices=["bfloat16"],
                   help="cast DP gradient all-reduce to this dtype "
                        "(explicit shard_map step; see docs/SCALING.md)")
    p.add_argument("--momentum-dtype", dest="momentum_dtype", default=None,
                   choices=["bfloat16"],
                   help="store SGD momentum in this dtype (halves the "
                        "optimizer's HBM buffer traffic; update math stays f32)")
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-spatial", type=int, default=1)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace into this dir")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (NaN-checking debug mode)")


def _build_config(args):
    from cspn_tpu.config import PRESETS, RunConfig

    cfg = PRESETS[args.preset] if args.preset else RunConfig()
    cfg = dataclasses.replace(cfg)  # shallow copy
    model, data, optim = (
        dataclasses.replace(cfg.model),
        dataclasses.replace(cfg.data),
        dataclasses.replace(cfg.optim),
    )
    if args.dataset:
        data.dataset = args.dataset
    for src, obj, dst in [
        ("train_list", data, "train_list"),
        ("eval_list", data, "eval_list"),
        ("root_dir", data, "root_dir"),
        ("n_sample", data, "n_sample"),
        ("input_format", data, "input_format"),
        ("batch_size_train", data, "batch_size_train"),
        ("batch_size_eval", data, "batch_size_eval"),
        ("num_workers", data, "num_workers"),
        ("worker_mode", data, "worker_mode"),
        ("model", model, "arch"),
        ("cspn_step", model, "cspn_steps"),
        ("cspn_norm_type", model, "cspn_norm_type"),
        ("cspn_backend", model, "cspn_backend"),
        ("dtype", model, "dtype"),
        ("cspn_io_dtype", model, "cspn_io_dtype"),
        ("lr", optim, "lr"),
        ("momentum", optim, "momentum"),
        ("weight_decay", optim, "weight_decay"),
        ("dampening", optim, "dampening"),
        ("nesterov", optim, "nesterov"),
        ("num_epoch", optim, "num_epochs"),
        ("loss", optim, "loss"),
        ("grad_reduce_dtype", optim, "grad_reduce_dtype"),
        ("momentum_dtype", optim, "momentum_dtype"),
    ]:
        v = getattr(args, src, None)
        if v is not None:
            setattr(obj, dst, v)
    if args.no_cspn:
        model.use_cspn = False
    if getattr(args, "act_static", False):
        model.act_static = True
    cfg = dataclasses.replace(cfg, model=model, data=data, optim=optim)
    if args.save_dir:
        cfg = dataclasses.replace(cfg, save_dir=args.save_dir)
    if args.best_model_dir:
        cfg = dataclasses.replace(cfg, best_model_dir=args.best_model_dir)
    if args.resume:
        cfg = dataclasses.replace(cfg, resume=True)
    if args.pretrain_path:
        cfg = dataclasses.replace(cfg, pretrained_path=args.pretrain_path)
    cfg = dataclasses.replace(
        cfg, mesh_data=args.mesh_data, mesh_spatial=args.mesh_spatial
    )
    return cfg


def cmd_train(args):
    cfg = _build_config(args)
    if cfg.model.dtype == "int8":
        # int8 is serving-only (round() has zero gradient); build_model
        # would silently train in bf16 -- fail loudly instead
        raise SystemExit(
            "--dtype int8 is serving-only (use it with `eval`); "
            "train with --dtype bfloat16 or float32"
        )
    from cspn_tpu.parallel import make_mesh
    from cspn_tpu.train.factory import build_loaders
    from cspn_tpu.train.loop import Trainer

    if getattr(args, "debug_nans", False):
        from cspn_tpu.utils.profiling import debug_nans

        debug_nans(True)

    from cspn_tpu.parallel.distributed import host_shard, initialize_multihost

    initialize_multihost()
    mesh = make_mesh(data=cfg.mesh_data, spatial=cfg.mesh_spatial)
    train_loader, val_loader = build_loaders(cfg, shard=host_shard())
    pretrained = None
    if cfg.pretrained_path:
        from cspn_tpu.models.torch_import import load_torch_encoder_params

        pretrained = load_torch_encoder_params(cfg.pretrained_path)
    trainer = Trainer(cfg, train_loader, val_loader, mesh=mesh,
                      pretrained_params=pretrained)
    if cfg.resume:
        trainer.resume("best_model")
    if getattr(args, "profile_dir", None):
        from cspn_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            trainer.fit()
    else:
        trainer.fit()


def cmd_eval(args):
    cfg = _build_config(args)
    from cspn_tpu.train.evaluate import run_eval

    run_eval(cfg, runs=args.runs, dump_images=args.dump_images,
             torch_checkpoint=args.import_torch_checkpoint)


def cmd_infer(args):
    """Batch inference through the serving front-end (cspn_tpu/serving.py):
    load best_model once, compile the bucket ladder, stream the val split
    through DepthServer.predict (bf16/int8 routed per bucket), dump
    %05d_pred.png depth maps.  The serving analog of the reference's
    eval.py:144 forward loop, minus metrics."""
    import numpy as np

    from cspn_tpu.serving import load_server
    from cspn_tpu.train.factory import build_dataset
    from cspn_tpu.utils.images import save_pred_image

    cfg = _build_config(args)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    int8_from = args.int8_from if args.int8_from > 0 else None
    srv = load_server(
        cfg,
        torch_checkpoint=args.import_torch_checkpoint,
        buckets=buckets,
        int8_from=int8_from,
    )
    ds = build_dataset(cfg, "val", seed=args.seed)
    h, w = ds[0]["rgbd"].shape[:2]
    srv.warmup(h, w)
    out_dir = args.out_dir or os.path.join(cfg.best_model_dir, "infer_result")
    n = len(ds) if args.max_frames is None else min(len(ds), args.max_frames)
    group = buckets[-1]
    for start in range(0, n, group):
        stop = min(start + group, n)
        batch = np.stack([ds[i]["rgbd"] for i in range(start, stop)])
        preds = srv.predict(batch)
        for j in range(stop - start):
            save_pred_image(cfg.data.dataset, out_dir, start + j, preds[j])
    print(
        f"==> wrote {n} predictions to {out_dir} "
        f"(served bf16={srv.served['bf16']} int8={srv.served['int8']})"
    )


def cmd_export(args):
    """Serving-artifact export (cspn_tpu/export.py): trace the eval graph
    at the serving geometry, serialize it as StableHLO and bundle it (plus
    the weights, unless --no-embed) into ONE file loadable WITHOUT the
    model zoo / config system on the serving host.  The compiler-level
    analog of distributing best_model.pth (reference eval.py:106-118)."""
    import jax.numpy as jnp
    import numpy as np

    from cspn_tpu.export import export_serving, load_artifact, save_artifact
    from cspn_tpu.train.evaluate import load_eval_state
    from cspn_tpu.train.loop import build_model

    cfg = _build_config(args)
    _, state, extra = load_eval_state(
        cfg, torch_checkpoint=args.import_torch_checkpoint
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = build_model(cfg, train=False)
    qcache = extra.get("qcache")
    if args.height and args.width:
        h, w = args.height, args.width
    else:
        from cspn_tpu.train.factory import build_dataset

        ds = build_dataset(cfg, "val", seed=0)
        h, w = ds[0]["rgbd"].shape[:2]
    exp = export_serving(model, variables, h, w, batch=args.batch, qcache=qcache)
    meta = {
        "arch": cfg.model.arch,
        "dtype": cfg.model.dtype,
        "cspn_steps": cfg.model.cspn_steps,
        "height": h,
        "width": w,
    }
    save_artifact(
        exp,
        args.out,
        variables=None if args.no_embed else variables,
        qcache=None if args.no_embed else qcache,
        meta=meta,
    )
    batch_desc = "b (symbolic)" if args.batch is None else str(args.batch)
    print(
        f"==> wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
        f"platforms {exp.platforms}, batch {batch_desc})"
    )
    if args.check:
        art = load_artifact(args.out)
        n = args.batch or 2
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n, h, w, 4)), jnp.float32
        )
        want = model.apply(
            dict(variables, qcache=qcache) if qcache is not None else variables, x
        )
        got = art.predict(x) if not args.no_embed else (
            art.call(variables, qcache, x) if qcache is not None
            else art.call(variables, x)
        )
        err = float(jnp.max(jnp.abs(want - got)))
        print(f"==> roundtrip check max|err| = {err:.3e}")


def cmd_demo(args):
    """Op-level demo mirroring cspn_paddle/demo.py: random guidance/feature
    volumes through `prop_step` propagation steps, one optimization loop
    validating differentiability, loss printed per iteration."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cspn_tpu.ops import cspn_nd

    dim, c, k, steps = args.dim_num, args.feat_chan, args.prop_kernel, args.prop_step
    map_shape = tuple([48, 64, 128][3 - dim :])
    n_gates = k**dim - 1
    rng = np.random.default_rng(0)
    guide = jnp.asarray(
        rng.random((args.batch_size, *map_shape, c * n_gates)), jnp.float32
    )
    feat = jnp.asarray(rng.random((args.batch_size, *map_shape, c)), jnp.float32)

    def loss_fn(g, f):
        return jnp.mean(cspn_nd(g, f, kernel_size=k, steps=steps))

    opt = optax.adam(1e-3)
    params = (guide, feat)
    opt_state = opt.init(params)
    step = jax.jit(
        lambda p, s: _demo_step(p, s, loss_fn, opt)
    )
    for i in range(args.iter_num):
        params, opt_state, loss = step(params, opt_state)
        print(f"iter={i:02d}  out={float(loss):.4f}", flush=True)


def _demo_step(params, opt_state, loss_fn, opt):
    import jax

    loss, grads = jax.value_and_grad(lambda p: loss_fn(*p))(params)
    updates, opt_state = opt.update(grads, opt_state)
    import optax

    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def _build_stereo(args):
    """Shared stereo config + loaders for train-stereo / eval-stereo."""
    from cspn_tpu.data import DataLoader, SceneFlowStereoDataset
    from cspn_tpu.data.datasets import SyntheticStereoDataset
    from cspn_tpu.train.stereo_loop import StereoConfig

    cfg = StereoConfig(
        max_disp=args.max_disp,
        features=args.features,
        cspn_steps=args.prop_step,
        use_cspn=not args.no_cspn,
        dtype=args.stereo_dtype or "float32",
        lr=args.lr,
        num_epochs=args.num_epoch,
        batch_size=args.batch_size,
        save_dir=args.save_dir,
    )
    if args.train_list:
        crop = (args.height, args.width)
        train_ds = SceneFlowStereoDataset(
            args.train_list, root_dir=args.root_dir, split="train", crop_hw=crop
        )
        val_ds = SceneFlowStereoDataset(
            args.eval_list or args.train_list, root_dir=args.root_dir,
            split="val", crop_hw=crop, seed=0,
        )
    else:
        train_ds = SyntheticStereoDataset(length=args.train_size,
                                          hw=(args.height, args.width),
                                          max_disp=cfg.max_disp, seed=0)
        val_ds = SyntheticStereoDataset(length=max(args.train_size // 4, 2),
                                        hw=(args.height, args.width),
                                        max_disp=cfg.max_disp, seed=1)
    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True, drop_last=True)
    val_loader = DataLoader(val_ds, cfg.batch_size)
    return cfg, train_loader, val_loader


def cmd_train_stereo(args):
    """Train the PSMNet+3D-CSPN stereo model on Scene Flow manifests
    (--train-list/--eval-list CSVs with left,right,disp columns; disparity
    as PFM, cspn_paddle/README.md:93) or the synthetic fixture."""
    from cspn_tpu.train.stereo_loop import StereoTrainer

    cfg, train_loader, val_loader = _build_stereo(args)
    StereoTrainer(cfg, train_loader, val_loader).fit()


def cmd_eval_stereo(args):
    """Evaluate the stereo model: EPE / >3px / D1 on the val set, optional
    KITTI-convention uint16 disparity PNG dumps."""
    from cspn_tpu.train.stereo_loop import StereoTrainer

    cfg, _, val_loader = _build_stereo(args)
    trainer = StereoTrainer(cfg, val_loader, val_loader)
    trainer.run_eval(checkpoint=args.checkpoint, dump_images=args.dump_images)


def cmd_make_manifest(args):
    from cspn_tpu.data.manifest import make_manifest

    n = make_manifest(args.data_dir, args.out, pattern=args.pattern,
                      relative_to=args.relative_to)
    print(f"wrote {n} rows to {args.out}")


def cmd_bench_scaling(args):
    import json
    import os

    if args.force_cpu_devices:
        # must run before any jax computation: flip the (lazily initialized)
        # backend to a virtual CPU mesh (see tests/conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cspn_tpu.utils.scaling import run_scaling_bench

    records = run_scaling_bench(
        arch=args.model or "resnet18",
        hw=(args.height, args.width),
        batch_per_device=args.batch_per_device,
        cspn_steps=args.cspn_step or 24,
        mode=args.mode,
        spatial=args.mesh_spatial_bench,
    )
    for r in records:
        print(json.dumps(r), flush=True)


def cmd_bench(args):
    del args
    import runpy
    import os

    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="cspn_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a depth-completion model")
    _add_common_overrides(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("eval", help="evaluate best_model on the val set")
    _add_common_overrides(p_eval)
    p_eval.add_argument("--runs", type=int, default=5,
                        help="sparse-resample eval runs to average (README protocol)")
    p_eval.add_argument("--dump-images", action="store_true")
    p_eval.add_argument("--import-torch-checkpoint", default=None,
                        help="evaluate a reference-trained .pth directly "
                             "(full-model state dict import; parity pinned by "
                             "tests/test_torch_oracle.py)")
    p_eval.set_defaults(fn=cmd_eval)

    p_inf = sub.add_parser(
        "infer",
        help="batch inference via the bucketed bf16/int8 serving front-end",
    )
    _add_common_overrides(p_inf)
    p_inf.add_argument("--buckets", default="1,8,32,128",
                       help="comma-separated compiled batch buckets")
    p_inf.add_argument("--int8-from", type=int, default=8,
                       help="smallest bucket served int8 (<=0: bf16 only); "
                            "default 8 = measured v5e crossover")
    p_inf.add_argument("--out-dir", default=None,
                       help="default <best_model_dir>/infer_result")
    p_inf.add_argument("--max-frames", type=int, default=None)
    p_inf.add_argument("--seed", type=int, default=0)
    p_inf.add_argument("--import-torch-checkpoint", default=None)
    p_inf.set_defaults(fn=cmd_infer)

    p_exp = sub.add_parser(
        "export",
        help="serialize the serving graph + weights as one StableHLO artifact",
    )
    _add_common_overrides(p_exp)
    p_exp.add_argument("--out", default="model.cspn", help="artifact path")
    p_exp.add_argument("--batch", type=int, default=None,
                       help="pin the batch dimension (default: symbolic -- "
                            "one artifact serves any request size)")
    p_exp.add_argument("--height", type=int, default=None)
    p_exp.add_argument("--width", type=int, default=None,
                       help="serving geometry; default = val-split geometry")
    p_exp.add_argument("--no-embed", action="store_true",
                       help="exclude weights (ship the checkpoint separately)")
    p_exp.add_argument("--check", action="store_true",
                       help="reload the artifact and verify output parity")
    p_exp.add_argument("--import-torch-checkpoint", default=None)
    p_exp.set_defaults(fn=cmd_export)

    p_demo = sub.add_parser("demo", help="2D/3D CSPN op demo (paddle demo.py)")
    p_demo.add_argument("--dim-num", type=int, default=3, choices=[2, 3])
    p_demo.add_argument("--feat-chan", type=int, default=1)
    p_demo.add_argument("--prop-kernel", type=int, default=3, choices=[3])
    p_demo.add_argument("--prop-step", type=int, default=24)
    p_demo.add_argument("--batch-size", type=int, default=3)
    p_demo.add_argument("--iter-num", type=int, default=20)
    p_demo.set_defaults(fn=cmd_demo)

    def _add_stereo_args(p):
        p.add_argument("--max-disp", type=int, default=64)
        p.add_argument("--features", type=int, default=16)
        p.add_argument("--prop-step", type=int, default=12)
        p.add_argument("--no-cspn", action="store_true")
        p.add_argument("--dtype", dest="stereo_dtype", default=None,
                       choices=["float32", "bfloat16"],
                       help="conv/activation dtype (bf16 mixed precision; "
                            "params and CSPN refinement stay f32)")
        p.add_argument("--lr", type=float, default=1e-3)
        p.add_argument("--num-epoch", type=int, default=5)
        p.add_argument("--batch-size", type=int, default=2)
        p.add_argument("--height", type=int, default=64)
        p.add_argument("--width", type=int, default=96)
        p.add_argument("--train-size", type=int, default=32)
        p.add_argument("--train-list", default=None,
                       help="Scene Flow CSV manifest (left,right,disp columns)")
        p.add_argument("--eval-list", default=None)
        p.add_argument("--root-dir", default=".")
        p.add_argument("--save-dir", default="result/stereo_cspn")

    p_st = sub.add_parser("train-stereo",
                          help="train the PSMNet + 3D-CSPN stereo model")
    _add_stereo_args(p_st)
    p_st.set_defaults(fn=cmd_train_stereo)

    p_se = sub.add_parser(
        "eval-stereo",
        help="evaluate the stereo model (EPE / >3px / D1, disparity dumps)",
    )
    _add_stereo_args(p_se)
    p_se.add_argument("--checkpoint", default="best_model")
    p_se.add_argument("--dump-images", action="store_true",
                      help="write %%05d_{disp,gt}.png (uint16 disp*256)")
    p_se.set_defaults(fn=cmd_eval_stereo)

    p_mm = sub.add_parser("make-manifest",
                          help="generate a datalist CSV from a directory of h5 frames")
    p_mm.add_argument("data_dir")
    p_mm.add_argument("out")
    p_mm.add_argument("--pattern", default="**/*.h5")
    p_mm.add_argument("--relative-to", default=None)
    p_mm.set_defaults(fn=cmd_make_manifest)

    p_bench = sub.add_parser("bench", help="run the throughput benchmark")
    p_bench.set_defaults(fn=cmd_bench)

    p_sc = sub.add_parser(
        "bench-scaling",
        help="throughput vs mesh size (DP weak scaling; one JSON line per size)",
    )
    p_sc.add_argument("--model", default="resnet18")
    p_sc.add_argument("--height", type=int, default=228)
    p_sc.add_argument("--width", type=int, default=304)
    p_sc.add_argument("--batch-per-device", type=int, default=4)
    p_sc.add_argument("--cspn-step", type=int, default=24)
    p_sc.add_argument("--mode", default="train",
                      choices=["train", "eval", "stereo"],
                      help="stereo = DP weak scaling of the stereo trainer")
    p_sc.add_argument("--mesh-spatial-bench", type=int, default=1,
                      help="spatial axis size (halo-exchange CSPN) per mesh")
    p_sc.add_argument("--force-cpu-devices", type=int, default=0,
                      help="N>0: run on an N-device virtual CPU mesh")
    p_sc.set_defaults(fn=cmd_bench_scaling)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
