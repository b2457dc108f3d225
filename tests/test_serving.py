"""Batch-adaptive serving front-end (cspn_tpu/serving.py).

Contracts pinned here:
  - bucket rounding / chunk planning arithmetic;
  - pad-row inertness: bucket-padded serving output == serving the exact
    batch (per-sample independence of the eval graph);
  - path routing: buckets below ``int8_from`` serve bf16, above serve the
    qcache int8 path, and the int8 bucket output equals a direct apply of
    the quantized model;
  - the ``load_server`` wiring (config -> dual models + qcache).

The latency story the policy encodes (bf16 wins at b1, int8 from ~b8) is a
TPU measurement: result/latency_bench.json.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cspn_tpu.models.unet import cspn_unet_resnet18
from cspn_tpu.serving import DepthServer, chunk_plan, load_server, pick_bucket


def test_pick_bucket_and_chunk_plan():
    buckets = (1, 8, 32, 128)
    assert pick_bucket(1, buckets) == 1
    assert pick_bucket(2, buckets) == 8
    assert pick_bucket(8, buckets) == 8
    assert pick_bucket(128, buckets) == 128
    with pytest.raises(ValueError):
        pick_bucket(129, buckets)
    assert chunk_plan(3, buckets) == [3]
    assert chunk_plan(128, buckets) == [128]
    assert chunk_plan(300, buckets) == [128, 128, 44]
    assert sum(chunk_plan(300, buckets)) == 300
    with pytest.raises(ValueError):
        chunk_plan(0, buckets)


@pytest.fixture(scope="module")
def tiny_serving():
    """One float model + its quant twin on a shared random param tree."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 96, 4)),
                    jnp.float32)
    model = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference")
    qmodel = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference", quant=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    from cspn_tpu.utils.quant import build_weight_qcache

    qcache = build_weight_qcache(qmodel, variables, x)
    return model, qmodel, variables, qcache


def _server(tiny_serving, buckets, int8_from):
    model, qmodel, variables, qcache = tiny_serving
    return DepthServer(
        model, variables, model_int8=qmodel, qcache=qcache,
        buckets=buckets, int8_from=int8_from,
    )


def test_padded_bucket_output_matches_exact_batch(tiny_serving, rng):
    # a request of 3 padded up to the 4-bucket must equal serving exactly 3:
    # eval-mode BN (running stats), CSPN, and the conv stack are all
    # per-sample independent, so the zero pad rows are inert
    model, _, variables, _ = tiny_serving
    x = jnp.asarray(rng.standard_normal((3, 64, 96, 4)).astype(np.float32))
    srv = _server(tiny_serving, buckets=(4,), int8_from=None)
    out = srv.predict(x)
    ref = np.asarray(model.apply(variables, x))
    assert out.shape == ref.shape == (3, 64, 96)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_path_routing_and_counters(tiny_serving, rng):
    x = jnp.asarray(rng.standard_normal((4, 64, 96, 4)).astype(np.float32))
    srv = _server(tiny_serving, buckets=(1, 4), int8_from=4)
    assert srv.path_for(1) == "bf16" and srv.path_for(4) == "int8"
    srv.predict(x[:1])
    assert srv.served == {"bf16": 1, "int8": 0}
    srv.predict(x)
    assert srv.served == {"bf16": 1, "int8": 4}
    # without the quant twin every bucket serves the float path
    model, _, variables, _ = tiny_serving
    srv_f = DepthServer(model, variables, buckets=(1, 4), int8_from=4)
    assert srv_f.path_for(4) == "bf16"


def test_int8_bucket_equals_direct_quant_apply(tiny_serving, rng):
    model, qmodel, variables, qcache = tiny_serving
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 4)).astype(np.float32))
    srv = _server(tiny_serving, buckets=(2,), int8_from=2)
    out = srv.predict(x)
    ref = np.asarray(qmodel.apply(dict(variables, qcache=qcache), x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_chunked_request_across_buckets(tiny_serving, rng):
    # 6 samples over buckets (1, 4): chunks [4, 2->bucket 4]; output must
    # equal the float/quant paths applied per the routing policy
    model, qmodel, variables, qcache = tiny_serving
    x = jnp.asarray(rng.standard_normal((6, 64, 96, 4)).astype(np.float32))
    srv = _server(tiny_serving, buckets=(1, 4), int8_from=4)
    out = srv.predict(x)
    assert out.shape == (6, 64, 96)
    ref = np.asarray(qmodel.apply(dict(variables, qcache=qcache), x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert srv.served == {"bf16": 0, "int8": 6}


def test_server_input_validation(tiny_serving):
    model, _, variables, _ = tiny_serving
    with pytest.raises(ValueError):
        DepthServer(model, variables, buckets=(4, 1))
    with pytest.raises(ValueError):
        DepthServer(model, variables, model_int8=model, qcache=None)
    srv = DepthServer(model, variables, buckets=(1,))
    with pytest.raises(ValueError):
        srv.predict(np.zeros((2, 64, 96), np.float32))


def test_cli_infer_synthetic(tmp_path):
    # end-to-end CLI: dataset -> server (both paths) -> %05d_pred.png dumps
    from cspn_tpu.cli import main

    out_dir = tmp_path / "preds"
    main([
        "infer", "--preset", "synthetic_smoke", "--cspn-step", "2",
        "--cspn-backend", "reference", "--best-model-dir", str(tmp_path),
        "--buckets", "1,2", "--int8-from", "2", "--max-frames", "3",
        "--out-dir", str(out_dir),
    ])
    dumped = sorted(p.name for p in out_dir.glob("*_pred.png"))
    assert dumped == ["00000_pred.png", "00001_pred.png", "00002_pred.png"]


def test_load_server_synthetic(tmp_path):
    # full wiring: config -> checkpoint load (random params fallback) ->
    # bf16 + int8 twins + qcache -> warmup + predict at synthetic geometry
    from cspn_tpu.config import PRESETS

    cfg = PRESETS["synthetic_smoke"]
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, cspn_steps=2),
        best_model_dir=str(tmp_path),
    )
    srv = load_server(cfg, buckets=(1, 2), int8_from=2)
    assert srv._apply_int8 is not None and srv._qcache is not None
    srv.warmup(64, 96)
    assert srv.served == {"bf16": 0, "int8": 0}
    out = srv.predict(np.zeros((3, 64, 96, 4), np.float32))
    assert out.shape == (3, 64, 96) and np.isfinite(out).all()
    assert srv.served == {"bf16": 1, "int8": 2}


def test_int8_static_bucket_equals_direct_static_apply(tiny_serving, rng):
    # a server built with calibrated activation scales serves the int8
    # bucket exactly as a direct static-quant apply
    from cspn_tpu.utils.quant import build_act_calibration

    model, qmodel, variables, qcache = tiny_serving
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 4)), jnp.float32)
    acal = build_act_calibration(qmodel, dict(variables, qcache=qcache), [x])
    srv = DepthServer(
        model, variables, model_int8=qmodel, qcache=qcache, acal=acal,
        buckets=(2,), int8_from=2,
    )
    want = qmodel.apply(dict(variables, qcache=qcache, acal=acal), x)
    # jit-vs-eager reduction order flips a few ulp (CLAUDE.md); same
    # tolerance as the dynamic-path test above
    np.testing.assert_allclose(
        np.asarray(srv.predict(x)), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    assert srv.served == {"bf16": 0, "int8": 2}


def test_load_server_act_static(tmp_path):
    from cspn_tpu.config import PRESETS

    cfg = PRESETS["synthetic_smoke"]
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, cspn_steps=2),
        best_model_dir=str(tmp_path),
    )
    srv = load_server(cfg, buckets=(1, 2), int8_from=2, act_static=True)
    assert "acal" in srv._extra_int8
    out = srv.predict(np.zeros((2, 64, 96, 4), np.float32))
    assert out.shape == (2, 64, 96) and np.isfinite(out).all()
