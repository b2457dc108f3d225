"""Scaling benchmark: throughput vs mesh size (SURVEY.md §6 north star:
frames/s at 1 chip / 1 host / N hosts with >=80% DP scaling efficiency).

Measures the jitted train step (fwd + masked-L1 + grads + SGD, donated
state) and/or the eval forward at mesh sizes 1, 2, 4, ... N over the 'data'
axis (weak scaling: fixed per-device batch).  Because the donated train
state threads through consecutive steps, every execution differs and the
axon tunnel's execution cache cannot short-circuit the timing.

On this hardware one real TPU chip is visible; multi-device numbers are
demonstrated on the virtual CPU mesh (``--force-cpu-devices N``), which
validates the sharding/collective mechanics and the harness itself -- real
multi-chip efficiency must be measured on a pod slice with the same entry
point.
"""

from __future__ import annotations

import time

import numpy as np


def _mesh_sizes(n: int) -> list[int]:
    sizes, s = [], 1
    while s <= n:
        sizes.append(s)
        s *= 2
    if sizes[-1] != n:
        sizes.append(n)
    return sizes


def run_scaling_bench(
    arch: str = "resnet18",
    hw: tuple[int, int] = (228, 304),
    batch_per_device: int = 4,
    cspn_steps: int = 24,
    mode: str = "train",
    warmup: int = 2,
    iters: int = 8,
    spatial: int = 1,
    max_devices: int | None = None,
) -> list[dict]:
    """Returns one record per mesh size: {devices, ms_per_step, frames_per_s,
    efficiency} (efficiency = fps / (devices * fps_1))."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cspn_tpu.models.unet import CSPNUNet, _LAYERS
    from cspn_tpu.parallel.mesh import make_mesh, replicate
    from cspn_tpu.train.loop import make_train_step
    from cspn_tpu.train.state import create_train_state

    n_dev = len(jax.devices())
    if max_devices is not None:
        n_dev = min(n_dev, max_devices)
    note = None
    if jax.devices()[0].platform != "tpu":
        import sys

        note = ("cpu-mesh mechanics only: virtual devices share host cores; "
                "validates sharding/collectives, NOT a scaling measurement")
        print(f"# NOTE: {note}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    records = []
    h, w = hw
    block, layers = _LAYERS[int(arch.replace("resnet", ""))]

    for n in _mesh_sizes(n_dev):
        if n * spatial > n_dev:
            break
        mesh = make_mesh(data=n, spatial=spatial, devices=jax.devices()[: n * spatial])
        if mode == "stereo":
            # DP weak scaling of the stereo trainer (BASELINE config 5);
            # small default geometry so the virtual CPU mesh stays tractable
            from cspn_tpu.train.state import TrainState, make_optimizer
            from cspn_tpu.train.stereo_loop import (
                StereoConfig,
                build_stereo_model,
                make_stereo_train_step,
            )

            cfg = StereoConfig(max_disp=4 * max(h // 16, 1), features=8,
                               cspn_steps=min(cspn_steps, 4))
            smodel = build_stereo_model(cfg, train=True)
            batch = batch_per_device * n
            left = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
            right = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.float32)
            disp = jnp.asarray(
                rng.uniform(0, cfg.max_disp - 1, (batch, h, w)), jnp.float32
            )
            sh = NamedSharding(mesh, P("data"))
            left, right, disp = (jax.device_put(v, sh) for v in (left, right, disp))
            variables = jax.jit(smodel.init)(
                jax.random.PRNGKey(0), left[:1], right[:1]
            )
            state = replicate(
                TrainState.create(
                    apply_fn=smodel.apply,
                    params=variables["params"],
                    batch_stats=variables.get("batch_stats", {}),
                    tx=make_optimizer(cfg.lr, momentum=0.9, weight_decay=1e-4,
                                      nesterov=False),
                ),
                mesh,
            )
            sstep = make_stereo_train_step(smodel, float(cfg.max_disp))
            loss = None
            for _ in range(warmup):
                state, loss, _ = sstep(state, left, right, disp)
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(iters):
                state, loss, _ = sstep(state, left, right, disp)
            jax.block_until_ready(loss)
            dt = (time.time() - t0) / iters
            records.append(
                {
                    "devices": n,
                    "spatial": spatial,
                    "batch": batch,
                    "model": "PSMNetCSPN",
                    "ms_per_step": round(dt * 1e3, 2),
                    "frames_per_s": round(batch / dt, 1),
                    **({"note": note} if note else {}),
                }
            )
            continue
        model = CSPNUNet(
            block=block,
            layers=layers,
            cspn_steps=cspn_steps,
            train=(mode == "train"),
            cspn_backend="auto",
            spatial_mesh=mesh if spatial > 1 else None,
        )
        batch = batch_per_device * n
        x = jnp.asarray(rng.standard_normal((batch, h, w, 4)), jnp.float32)
        y = jnp.abs(jnp.asarray(rng.standard_normal((batch, h, w)), jnp.float32))
        sh = NamedSharding(mesh, P("data"))
        x, y = jax.device_put(x, sh), jax.device_put(y, sh)

        if mode == "train":
            state = replicate(
                create_train_state(model, jax.random.PRNGKey(0), x), mesh
            )
            step = make_train_step(model)

            def run_once(state):
                state, loss, _ = step(state, x, y)
                return state, loss

            for _ in range(warmup):
                state, loss = run_once(state)
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(iters):
                state, loss = run_once(state)
            jax.block_until_ready(loss)
        else:
            variables = replicate(
                jax.jit(model.init)(jax.random.PRNGKey(0), x), mesh
            )
            fwd = jax.jit(model.apply)
            out = None
            for i in range(warmup):
                out = fwd(variables, x + 1e-6 * i)
            jax.block_until_ready(out)
            t0 = time.time()
            for i in range(iters):
                out = fwd(variables, x + 1e-6 * (i + warmup))
            jax.block_until_ready(out)

        dt = (time.time() - t0) / iters
        records.append(
            {
                "devices": n,
                "spatial": spatial,
                "batch": batch,
                "ms_per_step": round(dt * 1e3, 2),
                "frames_per_s": round(batch / dt, 1),
                **({"note": note} if note else {}),
            }
        )

    fps1 = records[0]["frames_per_s"]
    for r in records:
        r["efficiency"] = round(r["frames_per_s"] / (r["devices"] * fps1), 3)
    return records
