"""int8 serving quantization (utils/quant.py).

The quant path is a TPU serving lever (v5e MXU int8 = 2x bf16); correctness
contract: parameter trees are IDENTICAL to the float model (any checkpoint
serves quantized) and outputs track the float model to quantization
tolerance."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cspn_tpu.models.unet import cspn_unet_resnet18
from cspn_tpu.utils.quant import QuantConv, int8_conv, quantize_tensor, quantize_weights


def test_int8_conv_exact_on_integer_inputs(rng):
    # integer-valued f32 inputs within int8 range quantize losslessly
    # (scale from abs-max 127 -> 1.0), so the s32 accumulation is exact
    x = rng.integers(-127, 128, (2, 10, 12, 8)).astype(np.float32)
    w = rng.integers(-127, 128, (3, 3, 8, 16)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0  # pin the per-tensor activation scale to 127/127
    w[0, 0, 0, :] = 127.0  # ...and every per-output-channel weight scale
    y = int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)


def test_quantize_roundtrip_tolerance(rng):
    x = rng.standard_normal((4, 8, 8, 32)).astype(np.float32)
    q, s = quantize_tensor(jnp.asarray(x))
    s = np.asarray(s)
    assert q.dtype == jnp.int8 and s.shape == (4, 1, 1, 1)  # per-sample
    np.testing.assert_allclose(np.asarray(q, np.float32) * s, x,
                               atol=float(s.max()) * 0.5 + 1e-9)
    w = rng.standard_normal((3, 3, 16, 24)).astype(np.float32)
    wq, ws = quantize_weights(jnp.asarray(w))
    assert wq.shape == w.shape and ws.shape == (24,)
    np.testing.assert_allclose(
        np.asarray(wq, np.float32) * np.asarray(ws), w,
        atol=float(np.max(np.asarray(ws))) * 0.5 + 1e-9,
    )


def test_quantconv_param_compatible_and_close(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)).astype(np.float32))
    ref = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                  kernel_init=nn.initializers.he_normal())
    qc = QuantConv(16, 3)
    vars_ref = ref.init(jax.random.PRNGKey(0), x)
    vars_q = qc.init(jax.random.PRNGKey(0), x)
    # identical parameter structure AND identical init values (same
    # initializer, shape, dtype) => checkpoints are interchangeable
    assert jax.tree_util.tree_structure(vars_ref) == jax.tree_util.tree_structure(vars_q)
    np.testing.assert_array_equal(
        np.asarray(vars_ref["params"]["kernel"]), np.asarray(vars_q["params"]["kernel"])
    )
    y_ref = np.asarray(ref.apply(vars_ref, x))
    y_q = np.asarray(qc.apply(vars_ref, x))  # float checkpoint, int8 serve
    rel = np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.02, rel


def test_full_model_int8_close_to_float(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 4)).astype(np.float32))
    f32 = cspn_unet_resnet18(cspn_steps=4, cspn_backend="reference")
    q = cspn_unet_resnet18(cspn_steps=4, cspn_backend="reference", quant=True)
    variables = f32.init(jax.random.PRNGKey(0), x)
    # same param tree: the float init serves the quantized model directly
    out_f = np.asarray(f32.apply(variables, x))
    out_q = np.asarray(q.apply(variables, x))
    assert np.isfinite(out_q).all()
    # random-init compounds the per-layer quantization noise through every
    # block with no BN calibration; ~5% here.  The serving-quality gate is
    # metric deltas on a trained model: result/int8_eval.json (TPU artifact)
    rel = np.linalg.norm(out_q - out_f) / max(np.linalg.norm(out_f), 1e-9)
    assert rel < 0.08, rel


def test_qcache_apply_identical_to_dynamic(rng):
    # the load-time weight cache must change WHERE quantization happens,
    # not WHAT is computed: apply with qcache == dynamic apply, bit-exact
    from cspn_tpu.utils.quant import build_weight_qcache

    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)).astype(np.float32))
    qc = QuantConv(16, 3)
    variables = qc.init(jax.random.PRNGKey(0), x)
    assert "qcache" not in variables  # init never creates the cache
    cache = build_weight_qcache(qc, variables, x)
    wq, ws = cache["wq_ws"]
    assert wq.dtype == jnp.int8 and ws.shape == (16,)
    y_dyn = qc.apply(variables, x)
    y_cached = qc.apply({**variables, "qcache": cache}, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_cached))


def test_qcache_full_model_identical_and_param_tree_untouched(rng):
    from cspn_tpu.utils.quant import build_weight_qcache

    x = jnp.asarray(rng.standard_normal((1, 64, 96, 4)).astype(np.float32))
    q = cspn_unet_resnet18(cspn_steps=4, cspn_backend="reference", quant=True)
    variables = q.init(jax.random.PRNGKey(0), x)
    cache = build_weight_qcache(q, variables, x)
    # every cached leaf is an (int8 weights, scale) pair
    leaves = jax.tree_util.tree_leaves(cache)
    assert leaves and all(
        l.dtype in (jnp.int8, jnp.float32) for l in leaves
    )
    out_dyn = np.asarray(q.apply(variables, x))
    out_cached = np.asarray(q.apply({**variables, "qcache": cache}, x))
    # not bit-exact: the cache builder's jitted abs-max reduction can
    # differ from the dynamic path's by one ulp, flipping a handful of
    # near-.5 weights by +-1 int8 step (measured 239 of ~5M on this
    # fixture).  The contract is quantization-tolerance agreement.
    rel = np.linalg.norm(out_cached - out_dyn) / max(
        np.linalg.norm(out_dyn), 1e-9
    )
    assert rel < 1e-3, rel


def test_qcache_removes_weight_quant_from_serving_graph(rng):
    """With the cache, the serving graph contains no weight rounding --
    only one activation round per conv.  (The chained-repeat benches can't
    see this: XLA hoists loop-invariant weight quantization out of the
    fori_loop, which is how the r4 latency numbers mis-attributed the int8
    b1 gap to re-quantization.)"""
    from cspn_tpu.utils.quant import build_weight_qcache

    x = jnp.zeros((1, 64, 96, 4), jnp.float32)
    m = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference", quant=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    import re

    cache = build_weight_qcache(m, variables, x)
    n_convs = len(
        [l for p, l in jax.tree_util.tree_leaves_with_path(cache)
         if "wq_ws" in jax.tree_util.keystr(p) and l.dtype == jnp.int8]
    )
    assert n_convs >= 8  # encoder + 3 decoder blocks

    def serve(v, x):
        return m.apply(v, x)

    def round_shapes(v):
        # the lowering dedups repeated same-shape blocks into called
        # functions, so count DISTINCT round-op result shapes: weight
        # quantization rounds HWIO kernels (leading dim 3 or 1 = the
        # kernel tap), activation quantization rounds NHWC maps
        # (leading dim = batch 1 at this fixture... distinguished by
        # the 3x3 kernel prefix)
        txt = jax.jit(serve).lower(v, x).as_text()
        shapes = re.findall(
            r"stablehlo\.round_nearest_even.*?tensor<([0-9x]+)xf32>", txt
        )
        weightish = [s for s in shapes if s.startswith(("3x3x", "1x1x"))]
        return len(shapes), len(weightish)

    dyn_all, dyn_w = round_shapes(variables)
    cached_all, cached_w = round_shapes({**variables, "qcache": cache})
    assert dyn_w >= 5, (dyn_all, dyn_w)  # kernel-shaped rounds present
    assert cached_w == 0, (cached_all, cached_w)  # ...and gone with cache
    assert cached_all < dyn_all


def test_int8_subpixel_phase_split_identical_to_fused(rng):
    """The int8 phase-split decoder conv (features >= 128) must equal the
    fused zero-padded-kernel int8 form bit-for-bit: structural zeros
    change neither the per-(phase,channel) abs-max scales nor the s32
    accumulation, and the px-major concat preserves the layout."""
    from cspn_tpu.models.decoder import SubpixelUnpoolConv, _subpixel_weights
    from cspn_tpu.models.decoder import depth_to_space2
    from cspn_tpu.utils.quant import build_weight_qcache, int8_conv

    for k, cin, cout, h, w_ in ((5, 32, 128, 12, 16), (3, 16, 128, 10, 14)):
        x = jnp.asarray(rng.standard_normal((2, h, w_, cin)).astype(np.float32))
        mod = SubpixelUnpoolConv(cout, k, 2 * h, 2 * w_, quant=True)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y_split = mod.apply(variables, x)
        # fused reference: one int8 conv over the reindexed kernel
        wk = variables["params"]["kernel"]
        pad = (1, 1) if k >= 5 else (0, 1)
        y_fused = depth_to_space2(
            int8_conv(x, _subpixel_weights(wk, k), (1, 1), (pad, pad),
                      out_dtype=x.dtype),
            2 * h, 2 * w_,
        )
        np.testing.assert_array_equal(np.asarray(y_split), np.asarray(y_fused))
        # the load-time cache reproduces the result to quantization
        # tolerance (the builder's jitted abs-max can differ by one ulp,
        # flipping near-.5 weights by +-1 int8 step -- same bound as
        # test_qcache_full_model_identical_and_param_tree_untouched)
        cache = build_weight_qcache(mod, variables, x)
        y_cached = np.asarray(mod.apply({**variables, "qcache": cache}, x))
        assert len(cache["wq_ws"]) == 4  # four per-phase pairs
        ys = np.asarray(y_split)
        rel = np.linalg.norm(y_cached - ys) / max(np.linalg.norm(ys), 1e-9)
        assert rel < 1e-3, rel


def test_quant_is_serving_only(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    m = cspn_unet_resnet18(cspn_steps=2, train=True, quant=True)
    with pytest.raises(AssertionError, match="serving-only"):
        m.init(jax.random.PRNGKey(0), x)


def test_build_model_int8_plumbing():
    from cspn_tpu.config import RunConfig, ModelConfig
    from cspn_tpu.train.loop import build_model

    cfg = RunConfig(model=ModelConfig(arch="resnet18", dtype="int8"))
    m_eval = build_model(cfg, train=False)
    assert m_eval.quant and m_eval.dtype == jnp.bfloat16
    m_train = build_model(cfg, train=True)  # init/train path stays float
    assert not m_train.quant


# -- static (calibrated) activation scales ----------------------------------


@pytest.fixture(scope="module")
def calibrated():
    """Quant model + qcache + acal calibrated on the fixture input."""
    from cspn_tpu.utils.quant import build_act_calibration, build_weight_qcache

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 64, 96, 4)), jnp.float32
    )
    m = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference", quant=True)
    v = m.init(jax.random.PRNGKey(0), x)
    qc = build_weight_qcache(m, v, x)
    acal = build_act_calibration(m, dict(v, qcache=qc), [x])
    return m, v, qc, acal, x


def test_act_static_b1_identical_to_dynamic_on_calibration_input(calibrated):
    # for a single-sample batch the dynamic per-sample scale IS the global
    # abs-max the calibration recorded, so static serving of the
    # calibration input must be bit-identical to dynamic serving
    m, v, qc, acal, x = calibrated
    y_dyn = m.apply(dict(v, qcache=qc), x)
    y_sta = m.apply(dict(v, qcache=qc, acal=acal), x)
    assert bool(jnp.all(y_dyn == y_sta))


def test_act_static_removes_activation_reduce_from_serving_graph(calibrated):
    # dynamic activation quantization runs an abs-max reduce pass over
    # every quantized conv input; with calibrated scales those reduces
    # vanish from the lowered serving graph (the remaining few are the
    # model's own, e.g. CSPN gate normalization)
    m, v, qc, acal, x = calibrated

    def n_reduces(vv):
        txt = jax.jit(lambda v_, x_: m.apply(v_, x_)).lower(vv, x).as_text()
        return txt.count("stablehlo.reduce")

    dyn = n_reduces(dict(v, qcache=qc))
    sta = n_reduces(dict(v, qcache=qc, acal=acal))
    assert sta <= 5 < dyn, (dyn, sta)


def test_act_calibration_running_max_and_saturation(calibrated):
    from cspn_tpu.utils.quant import build_act_calibration

    m, v, qc, acal, x = calibrated
    # running max over batches: recalibrating with an extra, hotter batch
    # can only raise per-site maxima
    acal2 = build_act_calibration(m, dict(v, qcache=qc), [x, x * 2])
    pairs = zip(jax.tree.leaves(acal), jax.tree.leaves(acal2))
    assert all(bool(b >= a) for a, b in pairs)
    # out-of-range serving inputs saturate (clip at +-127) but stay finite
    y_hot = m.apply(dict(v, qcache=qc, acal=acal), x * 50)
    assert bool(jnp.isfinite(y_hot).all())


def test_act_static_error_vs_float_comparable_to_dynamic(calibrated):
    # static quantization error against the float model stays within 2x of
    # the dynamic error on a batch the calibration has not seen
    m, v, qc, acal, x = calibrated
    xb = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 64, 96, 4)) * 0.9,
        jnp.float32,
    )
    fm = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference")
    y_f = fm.apply(v, xb)
    e_dyn = float(jnp.sqrt(jnp.mean((m.apply(dict(v, qcache=qc), xb) - y_f) ** 2)))
    e_sta = float(
        jnp.sqrt(jnp.mean((m.apply(dict(v, qcache=qc, acal=acal), xb) - y_f) ** 2))
    )
    assert e_sta <= 2.0 * e_dyn + 1e-6, (e_dyn, e_sta)


def test_load_eval_state_builds_acal(tmp_path):
    import dataclasses

    from cspn_tpu.config import PRESETS
    from cspn_tpu.train.evaluate import load_eval_state

    base = PRESETS["synthetic_smoke"]
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model, dtype="int8", act_static=True, cspn_steps=2
        ),
        best_model_dir=str(tmp_path),
    )
    model, state, extra = load_eval_state(cfg)
    assert "qcache" in extra and "acal" in extra
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(extra["acal"]))
