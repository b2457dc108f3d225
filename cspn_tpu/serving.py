"""Batch-size-adaptive serving front-end (reference eval.py is the serving
path; eval.py:144 runs ``net(inputs)`` at a fixed bs=1).

TPU executables are shape-specialized, so a server facing variable-size
requests cannot jit one apply per request: ``DepthServer`` keeps a small
ladder of compiled batch buckets, pads each request up to the nearest
bucket, and chunks requests larger than the top bucket.  Per-sample
independence of the eval graph (running-stat BN, per-sample CSPN and
activation-quant scales) makes the pad rows inert -- sliced-off outputs
are identical to serving the exact batch (pinned by tests/test_serving.py).

Each bucket serves on the faster numeric path *for that size*.  The
measured v5e crossover (result/latency_bench.json) has dynamic-int8 convs
LOSING to bf16 below ~b8 -- 11.4 ms vs 2.8 ms at b1, the per-call
activation-quant chain (abs-max reduce + round per conv, serial at tiny
batch; weight quant is already cached at load,
utils/quant.build_weight_qcache) -- and winning ~1.3x from b8-b32 up.  So
small buckets route to bf16 and large buckets to int8; the split point is
the ``int8_from`` knob (default 8).  With load-time-calibrated static
activation scales (``load_server(act_static=True)``) the int8 path TIES
bf16 at b1 (2.81 vs 2.83 ms) and beats it everywhere else; the bf16 b1
bucket then only hedges against out-of-calibration saturation.

This is the TPU-native completion of the int8 serving story: b1 latency is
the bf16 number (2.8 ms) while saturated-batch throughput keeps the int8
number (1530 frames/s dynamic, 1628 with load-time-calibrated static
activation scales -- ``load_server(act_static=True)``), from one
checkpoint, behind one ``predict()``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cspn_tpu.config import RunConfig


def pick_bucket(n: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= n (n must not exceed max(buckets))."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"batch {n} exceeds max bucket {buckets[-1]}")


def chunk_plan(n: int, buckets: tuple[int, ...]) -> list[int]:
    """Split a request of n samples into per-chunk sizes: greedy top-bucket
    chunks, then one remainder chunk (padded to its own bucket by the
    caller).  sum(plan) == n."""
    if n <= 0:
        raise ValueError("empty request")
    top = buckets[-1]
    plan = [top] * (n // top)
    if n % top:
        plan.append(n % top)
    return plan


class DepthServer:
    """Bucketed, dual-path serving for a depth-completion model.

    Parameters
    ----------
    model_bf16 / model_int8 : eval-mode model variants sharing one param
        tree (``build_model(cfg, train=False)`` at dtype bfloat16 / int8).
        ``model_int8=None`` serves every bucket on the bf16 path.
    variables : {'params': ..., 'batch_stats': ...} (bf16-cast for serving).
    qcache : load-time int8 weight cache (utils/quant.build_weight_qcache);
        required when model_int8 is given.
    buckets : ascending compiled batch sizes.
    int8_from : smallest bucket served on the int8 path (measured v5e
        crossover = 8; result/latency_bench.json).
    """

    def __init__(
        self,
        model_bf16,
        variables: dict,
        model_int8=None,
        qcache=None,
        acal=None,
        buckets: tuple[int, ...] = (1, 8, 32, 128),
        int8_from: int | None = 8,
    ):
        if tuple(sorted(buckets)) != tuple(buckets) or len(set(buckets)) != len(buckets):
            raise ValueError(f"buckets must be strictly ascending, got {buckets}")
        if model_int8 is not None and qcache is None:
            raise ValueError("model_int8 requires the load-time qcache")
        self.buckets = tuple(int(b) for b in buckets)
        self.int8_from = int8_from
        self._variables = variables
        self._qcache = qcache
        # int8 serving collections: the weight cache plus (when calibrated,
        # utils/quant.build_act_calibration) static activation scales
        self._extra_int8 = dict(
            {"qcache": qcache} if qcache is not None else {},
            **({"acal": acal} if acal is not None else {}),
        )
        # params passed as jit args (not closures) so weights stay device
        # buffers instead of being baked into the executable as constants
        self._apply_bf16 = jax.jit(
            lambda v, x: model_bf16.apply(v, x), donate_argnums=()
        )
        self._apply_int8 = (
            jax.jit(lambda v, e, x: model_int8.apply(dict(v, **e), x))
            if model_int8 is not None
            else None
        )
        self.served = {"bf16": 0, "int8": 0}  # samples per path (observability)

    # -- policy --------------------------------------------------------------
    def path_for(self, bucket: int) -> str:
        if (
            self._apply_int8 is not None
            and self.int8_from is not None
            and bucket >= self.int8_from
        ):
            return "int8"
        return "bf16"

    # -- execution -----------------------------------------------------------
    def _run_bucket(self, x: jnp.ndarray, n_real: int | None = None) -> jnp.ndarray:
        # n_real: request samples in this bucket (excludes pad rows) for the
        # served-traffic counters; defaults to the full bucket
        path = self.path_for(x.shape[0])
        self.served[path] += x.shape[0] if n_real is None else n_real
        if path == "int8":
            return self._apply_int8(self._variables, self._extra_int8, x)
        return self._apply_bf16(self._variables, x)

    def predict(self, rgbd: np.ndarray | jnp.ndarray) -> np.ndarray:
        """Serve one request: rgbd [N,H,W,4] -> dense depth [N,H,W].

        N is arbitrary: chunked over the top bucket, remainder zero-padded
        up to its bucket and sliced back.
        """
        x = jnp.asarray(rgbd)
        if x.ndim != 4:
            raise ValueError(f"expected NHWC rgbd, got shape {x.shape}")
        outs = []
        start = 0
        for size in chunk_plan(x.shape[0], self.buckets):
            chunk = x[start : start + size]
            start += size
            bucket = pick_bucket(size, self.buckets)
            if bucket != size:
                pad = jnp.zeros((bucket - size,) + chunk.shape[1:], chunk.dtype)
                out = self._run_bucket(jnp.concatenate([chunk, pad]), size)[:size]
            else:
                out = self._run_bucket(chunk)
            outs.append(out)
        return np.asarray(jnp.concatenate(outs) if len(outs) > 1 else outs[0])

    def warmup(self, height: int, width: int) -> None:
        """Pre-compile every bucket at the serving geometry (first-request
        latency otherwise eats a ~30 s XLA compile per new shape)."""
        for b in self.buckets:
            jax.block_until_ready(
                self._run_bucket(jnp.zeros((b, height, width, 4), jnp.float32))
            )
        for k in self.served:  # warmup traffic is not served traffic
            self.served[k] = 0


def load_server(
    cfg: RunConfig,
    checkpoint: str = "best_model",
    torch_checkpoint: str | None = None,
    buckets: tuple[int, ...] = (1, 8, 32, 128),
    int8_from: int | None = 8,
    act_static: bool | None = None,
) -> DepthServer:
    """Build a DepthServer from a checkpoint: loads once, casts params to
    bf16, builds the int8 variant + weight-quant cache (+ calibrated
    static activation scales when `act_static`, default = cfg.model
    setting) when any bucket can route to int8."""
    from cspn_tpu.train.evaluate import load_eval_state
    from cspn_tpu.train.loop import build_model

    want_int8 = int8_from is not None and any(b >= int8_from for b in buckets)
    if act_static is None:
        act_static = getattr(cfg.model, "act_static", False)
    base = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            dtype="int8" if want_int8 else "bfloat16",
            act_static=act_static and want_int8,
        ),
    )
    # load_eval_state casts params/batch_stats to bf16 and (under int8)
    # builds the weight qcache in extra_vars
    _, state, extra = load_eval_state(base, checkpoint, torch_checkpoint=torch_checkpoint)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    bf16_cfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, dtype="bfloat16")
    )
    model_bf16 = build_model(bf16_cfg, train=False)
    model_int8 = build_model(base, train=False) if want_int8 else None
    return DepthServer(
        model_bf16,
        variables,
        model_int8=model_int8,
        qcache=extra.get("qcache") if want_int8 else None,
        acal=extra.get("acal") if want_int8 else None,
        buckets=buckets,
        int8_from=int8_from,
    )
