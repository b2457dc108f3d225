"""int8 serving quantization for the conv stack.

TPU-native serving lever with no reference analog: the v5e MXU runs int8
matmuls/convs at 2x the bf16 rate (394 vs 197 TOPS), and the big decoder
convs are compute-bound at eval (README: layer1's 774-GFLOP conv runs at the
bf16 MXU roofline).  Quantizing those convs to s8 x s8 -> s32 halves their
compute time bound.

Scheme (standard post-training dynamic quantization):
  - weights: symmetric per-output-channel int8, scale = max|w| / 127 over
    (kh, kw, cin);
  - activations: symmetric per-tensor *dynamic* int8 (abs-max of the batch
    tensor, computed on device each call — no calibration data needed), or
    *static* per-site scales from an offline calibration pass
    (build_act_calibration) which removes the per-call reduce;
  - conv accumulates in int32 (exact), dequantized as y * (x_scale * w_scale)
    with the per-channel weight scale broadcast over the channel dim.

Parameters are untouched: `QuantConv` declares the same float 'kernel'
(name, shape, init) as the `nn.Conv` it replaces and quantizes on the fly
at trace time, so checkpoints/state dicts are fully interchangeable with
the bf16/f32 model variants and the torch importer.  First/last layers
(stem, depth/guidance heads) and the CSPN propagation stay high-precision,
per usual PTQ practice — see models/unet.py.

Serving-only: `round` has zero gradient, so the quant path guards against
being used for training (models pass quant=False when train=True).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def quantize_tensor(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric dynamic int8, per leading (batch) axis when x is 4D NHWC:
    returns (q, scale) with x ~= q * scale.  Per-sample scales cost nothing
    extra (the abs-max reduce runs anyway) and keep one bright image from
    crushing the rest of the batch's resolution."""
    if x.ndim == 4:
        scale = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
    else:
        scale = jnp.max(jnp.abs(x))
    scale = jnp.maximum(scale, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_tensor_static(
    x: jnp.ndarray, scale: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with a precomputed (calibrated) scale: pure
    elementwise round/clip -- no abs-max reduce pass over the tensor.
    Activations beyond the calibrated range saturate at +/-127."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_weights(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 for an HWIO kernel.

    Returns (q, scale[cout]) with w ~= q * scale (broadcast over cout)."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv_prequant(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    ws: jnp.ndarray,
    strides: tuple[int, int],
    padding,
    out_dtype=jnp.float32,
    x_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """int8 NHWC conv with already-quantized weights (wq int8, ws[cout]):
    quantize x (dynamic, per tensor/sample, or static when `x_scale` is a
    calibrated scale), s8 x s8 -> s32 on the MXU, dequantize to
    `out_dtype`."""
    if x_scale is None:
        xq, xs = quantize_tensor(x)
    else:
        xq, xs = quantize_tensor_static(x, x_scale)
    y = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def int8_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides: tuple[int, int],
    padding,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Dynamic-int8 NHWC conv: quantize x (per tensor) and w (per cout),
    s8 x s8 -> s32 on the MXU, dequantize to `out_dtype`."""
    wq, ws = quantize_weights(w)
    return int8_conv_prequant(x, wq, ws, strides, padding, out_dtype)


QCACHE_COL = "qcache"


def module_qcache(module: nn.Module, make_quantized):
    """Inside a module's __call__: return `make_quantized()` (any pytree of
    pre-quantized weights), served from the optional 'qcache'
    collection when present (or being built via a mutable apply), computed
    dynamically otherwise."""
    if module.has_variable(QCACHE_COL, "wq_ws") or (
        module.scope is not None
        and module.scope.is_mutable_collection(QCACHE_COL)
        and not module.is_initializing()
    ):
        return module.variable(QCACHE_COL, "wq_ws", make_quantized).value
    return make_quantized()


def module_weight_qcache(module: nn.Module, make_weights):
    """`module_qcache` specialization: one (wq, ws) pair for `make_weights()`.
    Shared by QuantConv and the subpixel decoder conv (which quantizes its
    phase-REINDEXED weights, so the cached tensor is not the raw param)."""
    return module_qcache(module, lambda: quantize_weights(make_weights()))


ACAL_COL = "acal"


def module_act_scale(module: nn.Module, x):
    """Static activation scale for this conv site from the optional 'acal'
    collection (see build_act_calibration).

    Serving with calibration (acal supplied, immutable): returns the
    static scale, making activation quantize pure elementwise -- no
    per-call abs-max reduce pass over the input tensor.  During a
    calibration apply (mutable 'acal'): records the running abs-max of x
    at this site and returns None (the calibration pass itself quantizes
    dynamically).  Without calibration: returns None (dynamic scales).
    """
    recording = (
        module.scope is not None
        and module.scope.is_mutable_collection(ACAL_COL)
        and not module.is_initializing()
    )
    if recording:
        amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        var = module.variable(ACAL_COL, "xmax", lambda: amax)
        var.value = jnp.maximum(var.value, amax)
        return None
    if module.has_variable(ACAL_COL, "xmax"):
        xmax = module.get_variable(ACAL_COL, "xmax")
        return jnp.maximum(xmax, 1e-12) / 127.0
    return None


def build_act_calibration(model, variables, batches):
    """Calibrate static per-site activation scales: run `batches` through
    the serving graph recording each quantized conv's input abs-max;
    returns the 'acal' collection to merge into the serving variables
    alongside 'qcache'.

    Standard PTQ calibration: trades the per-call abs-max reduce over
    every quantized conv's input (an extra HBM read pass per conv) for
    saturating quantization outside the calibrated range.  Check metric
    deltas on a trained checkpoint before serving with it
    (scripts/int8_bench.py)."""
    import jax

    step = jax.jit(lambda v, x: model.apply(v, x, mutable=[ACAL_COL])[1][ACAL_COL])
    acal = None
    for xb in batches:
        vs = dict(variables, **({ACAL_COL: acal} if acal is not None else {}))
        acal = step(vs, xb)
    if acal is None:
        raise ValueError("calibration needs at least one batch")
    return acal


class QuantConv(nn.Module):
    """Drop-in replacement for the models' bias-free `nn.Conv`: identical
    parameter ('kernel', HWIO, float32, he_normal), int8 execution.

    Weight quantization has two modes:
      - dynamic (default): quantize `kernel` on every call.  Zero setup,
        but a per-request serve then re-quantizes ~218 M static weights
        per call (the cost hides in chained benches because XLA hoists
        loop-invariant quantize ops -- see scripts/latency_bench.py).
      - cached: when a 'qcache' variable collection is supplied to
        `.apply` (built once at checkpoint-load time by
        `build_weight_qcache`), the pre-quantized (wq, ws) pair is read
        from it and only the activations quantize dynamically.  Params are
        untouched either way -- the cache is a separate, optional,
        derived-at-load collection, so checkpoints stay interchangeable.

    Activation quantization is dynamic (per-sample abs-max each call) by
    default, or static when an 'acal' collection of calibrated scales is
    supplied (build_act_calibration) -- which removes the per-call reduce
    pass over every conv input.
    """

    features: int
    kernel: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        pad = (k - 1) // 2
        strides = (self.stride, self.stride)
        padding = ((pad, pad), (pad, pad))
        out_dtype = self.dtype or x.dtype
        wq, ws = module_weight_qcache(self, lambda: w)
        return int8_conv_prequant(
            x, wq, ws, strides, padding, out_dtype,
            x_scale=module_act_scale(self, x),
        )


def build_weight_qcache(model, variables, sample_x):
    """Pre-quantize every QuantConv kernel ONCE at serving-load time.

    Returns the 'qcache' collection to merge into the serving
    variables: ``model.apply({**variables, "qcache": qc}, x)``.

    The cache STRUCTURE is discovered with `jax.eval_shape` over a
    mutable-qcache apply (zero FLOPs, no compile of the conv graph), then
    the values are filled by one tiny jitted pass over the params -- so
    building the cache costs a quantization sweep of the weights, not a
    model forward.  A cached shape that differs from the raw `kernel`
    param is the subpixel decoder conv, whose serving weights are the
    phase-REINDEXED kernel (models/decoder.py:SubpixelUnpoolConv); the
    fill applies the same reindex.
    """
    import jax

    shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x, mutable=[QCACHE_COL])[1],
        variables,
        sample_x,
    )[QCACHE_COL]

    def _quantized(q_val, kernel):
        if len(q_val) == 4:
            # subpixel PHASE-SPLIT decoder conv: four exact per-phase
            # kernels (px-major order, matching the forward's concat)
            from cspn_tpu.models.decoder import _phase_kernel

            k = kernel.shape[0]
            return tuple(
                quantize_weights(_phase_kernel(kernel, k, px2, py2))
                for px2 in range(2)
                for py2 in range(2)
            )
        q_shape = q_val[0]
        if tuple(q_shape.shape) == tuple(kernel.shape):
            return quantize_weights(kernel)
        from cspn_tpu.models.decoder import _subpixel_weights

        wq = _subpixel_weights(kernel, kernel.shape[0])
        assert tuple(q_shape.shape) == tuple(wq.shape), (
            q_shape.shape, kernel.shape, wq.shape,
        )
        return quantize_weights(wq)

    def _fill(qnode, pnode):
        return {
            name: (
                _quantized(child, pnode["kernel"])
                if name == "wq_ws"
                else _fill(child, pnode[name])
            )
            for name, child in dict(qnode).items()
        }

    return jax.jit(lambda p: _fill(shapes, p))(variables["params"])
